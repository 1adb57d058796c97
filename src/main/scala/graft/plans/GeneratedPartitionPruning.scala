package graft.plans

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampType}

import graft.sources.LakehouseTable

/** GENERATED-COLUMN PARTITION PRUNING (the Delta feature, expressed over
  * the graft manifest): a table partitioned by `day` where the manifest
  * declares `day = date(ts)` can answer `WHERE ts BETWEEN a AND b`
  * by reading only the matching `day=` directories — but Spark's
  * partition pruning only sees predicates on `day` itself, and the query
  * never mentions it. This rule derives the implied partition predicate
  * from range/equality conjuncts on the SOURCE column and injects it
  * into the Filter; the built-in PruneFileSourcePartitions then turns it
  * into directory-level pruning. At 100 TB this is the difference
  * between scanning one day and listing the whole lake for every
  * timestamp-range query.
  *
  * Soundness: both declared kinds (`date@<zone>`, `div:N` — see
  * [[LakehouseTable.generatedColsAt]]) are MONOTONE non-decreasing in
  * the source, so src ≥ L implies gen(src) ≥ gen(L) and src ≤ U implies
  * gen(src) ≤ gen(U); the derived conjunct only widens the Filter with
  * an implied condition — rows are never added or removed, the original
  * predicate still applies. `date@<zone>` literals are derived with
  * Spark's own timestamp→date Cast under the DECLARED timezone (pinned
  * at declaration time — deriving under the READING session's timezone
  * could shift gen(literal) by a day and silently exclude matching
  * rows, so the legacy un-zoned `date` kind is never derived from),
  * `div:N` with floorDiv (= floor(x / N) exactly). The rule runs in the
  * operator-optimization fixed point, so it refuses to re-add a conjunct
  * that is already present (semantic equality) — one pass converges.
  *
  * Planning cost: all table discovery and manifest access goes through
  * the Hadoop FileSystem API (scheme-aware — a `file:`-URI or
  * hdfs://-rooted relation resolves identically; the streaming-source
  * anchor pattern), and is memoized: scan-path → root discovery is
  * cached forever (roots are immutable), and the generated-col triples
  * are cached per (root, version) — manifests are immutable, so the
  * manifest FILE is read at most once per version per JVM no matter how
  * many Filter nodes or optimizer passes consult it. The only repeated
  * IO is one directory listing per graft Filter per pass to learn the
  * current version. */
case class GeneratedPartitionPruning(spark: SparkSession)
    extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import GeneratedPartitionPruning._

  private def hadoopConf = spark.sessionState.newHadoopConf()

  /** The graft table root of a (possibly attribute-projected) parquet
    * relation, with the relation itself. */
  private def graftRelation(plan: LogicalPlan): Option[(LogicalRelation, String)] =
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[Attribute]) =>
        graftRelation(child)
      case l: LogicalRelation =>
        l.relation match {
          case fs: HadoopFsRelation =>
            // rootPaths, not inputFiles: no full listing per Filter per
            // optimizer pass. Memoized per scan path — data files are
            // immutable and every write lands under a fresh uuid dir, so
            // a cached discovery can never go stale.
            fs.location.rootPaths.headOption.map(_.toString).flatMap { f =>
              // cache positive discoveries and CLEAN not-found probes
              // forever (roots are immutable); a transient FS error must
              // NOT cache None — that would silently disable pruning for
              // this scan path for the JVM lifetime. Retry next pass.
              val root = rootCache.get(f).getOrElse {
                try { val r = discoverRoot(f); rootCache.put(f, r); r }
                catch { case NonFatal(_) => None }
              }
              root.map(r => (l, r))
            }
          case _ => None
        }
      case _ => None
    }

  /** Scan '/data/' occurrences RIGHT to left and demand the graft
    * manifest dir — a lake living under a path that itself contains
    * '/data/' must not resolve to a different (or wrong) root. The probe
    * resolves through the path's own FileSystem, so any scheme works.
    * A clean not-found probe returns None (cacheable — not a graft
    * table); any OTHER FS error propagates so the caller can skip
    * WITHOUT caching the failure as a permanent None. */
  private def discoverRoot(f: String): Option[String] =
    Iterator.iterate(f.lastIndexOf("/data/"))(i =>
        f.lastIndexOf("/data/", i - 1))
      .takeWhile(_ > 0)
      .map(f.substring(0, _))
      .find { r =>
        val p = new HPath(r, "_manifest")
        val fsys = p.getFileSystem(hadoopConf)
        try fsys.getFileStatus(p).isDirectory
        catch { case _: java.io.FileNotFoundException => false }
      }

  /** Current version + that manifest's modification time, via ONE
    * Hadoop-FS listing (scheme-aware twin of
    * [[LakehouseTable.currentVersion]]). The mtime rides along as the
    * cache epoch: a table deleted and re-created at the same root gets a
    * fresh manifest file, so a stale cached declaration can never be
    * served for same-numbered versions of a different table. */
  private def currentVersionVia(root: String): Option[(Long, Long)] =
    try {
      val dir = new HPath(root, "_manifest")
      val fsys = dir.getFileSystem(hadoopConf)
      val vs = fsys.listStatus(dir).iterator.flatMap { st =>
        val n = st.getPath.getName
        if (!n.endsWith(".json")) None
        else scala.util.Try(n.stripSuffix(".json").toLong).toOption
          .map(v => (v, st.getModificationTime))
      }.toSeq
      if (vs.isEmpty) None else Some(vs.maxBy(_._1))
    } catch { case NonFatal(_) => None }

  /** Generated-col triples at (root, v, manifest mtime), reading the
    * manifest through the Hadoop FS at most once per key per JVM. A
    * transient read failure returns Nil WITHOUT caching — pruning for
    * that version retries on the next planning instead of being
    * permanently lost. */
  private def gensAt(root: String, v: Long,
      mtime: Long): Seq[(String, String, String)] =
    genCache.get((root, v, mtime)).getOrElse {
      try {
        manifestReads.incrementAndGet()
        val p = new HPath(new HPath(root, "_manifest"), s"$v.json")
        val fsys = p.getFileSystem(hadoopConf)
        val in = fsys.open(p)
        val txt =
          try {
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
            out.toString("UTF-8")
          } finally in.close()
        val gens = LakehouseTable.parseGeneratedCols(txt)
        genCache.putIfAbsent((root, v, mtime), gens)
        gens
      } catch { case NonFatal(_) => Nil }
    }

  /** The declared timezone of a date-kind generation, when derivable.
    * Legacy un-zoned `date` declarations are skipped: without the
    * declaring timezone on record, evaluating under the reading
    * session's could shift the bound by a day — missed pruning is safe,
    * a wrong injected predicate is not. */
  private def dateZoneOf(kind: String): Option[String] =
    if (kind.startsWith("date@")) Some(kind.drop(5)) else None

  /** gen(v) as a Literal of the partition attribute's type, or None when
    * the literal/source types don't fit the declared kind. */
  private def genLiteral(kind: String, lit: Literal,
      partType: org.apache.spark.sql.types.DataType): Option[Literal] =
    (kind, lit.dataType, lit.value) match {
      case (_, _, null) => None
      case (k, TimestampType, micros: java.lang.Long) if k.startsWith("date") =>
        // Spark's own timestamp→date cast under the DECLARED timezone
        dateZoneOf(k).flatMap { tz =>
          val d = Cast(Literal(micros, TimestampType), DateType, Some(tz))
            .eval(null)
          if (partType == DateType) Some(Literal(d, DateType)) else None
        }
      case (d, t, v) if d.startsWith("div:") =>
        val n = d.drop(4).toLong
        val x = (t, v) match {
          case (LongType, l: java.lang.Long)       => Some(l.longValue())
          case (IntegerType, i: java.lang.Integer) => Some(i.longValue())
          case _                                   => None
        }
        x.map(Math.floorDiv(_, n)).flatMap { b =>
          partType match {
            case LongType    => Some(Literal(b, LongType))
            case IntegerType if b == b.toInt => Some(Literal(b.toInt, IntegerType))
            case _           => None
          }
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      graftRelation(child) match {
        case None => f
        case Some((rel, root)) =>
          val gens = currentVersionVia(root)
            .map { case (v, mtime) => gensAt(root, v, mtime) }
            .getOrElse(Nil)
          if (gens.isEmpty) f
          else {
            val conjuncts = splitConjunctivePredicates(cond)
            val derived = gens.flatMap { case (partCol, kind, srcCol) =>
              (rel.output.find(_.name.equalsIgnoreCase(partCol)),
                rel.output.find(_.name.equalsIgnoreCase(srcCol))) match {
                // the Filter is rebuilt over its existing child: a
                // ColumnPruning-inserted Project may have pruned the
                // partition column away, and referencing it would make
                // the rebuilt Filter an invalid plan — derive only when
                // the child still outputs the attribute
                case (Some(partAttr), Some(srcAttr))
                    if child.outputSet.contains(partAttr) =>
                  conjuncts.flatMap(deriveOne(_, srcAttr, partAttr, kind))
                case _ => Nil
              }
            }
            val fresh = derived.filterNot(d =>
              conjuncts.exists(_.semanticEquals(d)))
            if (fresh.isEmpty) f
            else Filter((conjuncts ++ fresh).reduce(And), child)
          }
      }
  }

  /** True when `lit` sits exactly on the LEFT EDGE of its generation
    * bucket (midnight in the declared zone for `date@`, a multiple of N
    * for `div:N`) — a strict upper bound at the edge excludes the whole
    * bucket, so the partition bound may step one bucket down. */
  private def onBucketEdge(kind: String, lit: Literal): Boolean =
    (kind, lit.dataType, lit.value) match {
      case (k, TimestampType, micros: java.lang.Long) if k.startsWith("date") =>
        dateZoneOf(k).exists { tzId =>
          val tz = Some(tzId)
          val d = Cast(Literal(micros, TimestampType), DateType, tz).eval(null)
          Cast(Literal(d, DateType), TimestampType, tz).eval(null) == micros
        }
      case (d, LongType, l: java.lang.Long) if d.startsWith("div:") =>
        Math.floorMod(l.longValue(), d.drop(4).toLong) == 0L
      case (d, IntegerType, i: java.lang.Integer) if d.startsWith("div:") =>
        Math.floorMod(i.longValue(), d.drop(4).toLong) == 0L
      case _ => false
    }

  private def oneBucketDown(l: Literal): Option[Literal] = l match {
    case Literal(d: java.lang.Integer, DateType)    => Some(Literal(d - 1, DateType))
    case Literal(v: java.lang.Long, LongType)       => Some(Literal(v - 1, LongType))
    case Literal(v: java.lang.Integer, IntegerType) => Some(Literal(v - 1, IntegerType))
    case _ => None
  }

  /** The partition-column conjunct implied by one source-column
    * comparison, if any. A strict LOWER bound still derives the
    * non-strict partition form (gen is a step function: src > L allows
    * gen(src) = gen(L)); a strict UPPER bound exactly on a bucket edge
    * steps one bucket down (ts < midnight excludes that whole day). */
  private def deriveOne(c: Expression, src: Attribute, part: Attribute,
      kind: String): Option[Expression] = {
    def lo(l: Literal) = genLiteral(kind, l, part.dataType)
      .map(GreaterThanOrEqual(part, _))
    def hi(l: Literal) = genLiteral(kind, l, part.dataType)
      .map(LessThanOrEqual(part, _))
    def hiStrict(l: Literal) = genLiteral(kind, l, part.dataType).flatMap { g =>
      (if (onBucketEdge(kind, l)) oneBucketDown(g) else Some(g))
        .map(LessThanOrEqual(part, _))
    }
    c match {
      case GreaterThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(src) => lo(l)
      case GreaterThan(a: Attribute, l: Literal) if a.semanticEquals(src)        => lo(l)
      case LessThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(src)    => hi(l)
      case LessThan(a: Attribute, l: Literal) if a.semanticEquals(src)           => hiStrict(l)
      case EqualTo(a: Attribute, l: Literal) if a.semanticEquals(src) =>
        genLiteral(kind, l, part.dataType).map(EqualTo(part, _))
      case GreaterThanOrEqual(l: Literal, a: Attribute) if a.semanticEquals(src) => hi(l)
      case GreaterThan(l: Literal, a: Attribute) if a.semanticEquals(src)        => hiStrict(l)
      case LessThanOrEqual(l: Literal, a: Attribute) if a.semanticEquals(src)    => lo(l)
      case LessThan(l: Literal, a: Attribute) if a.semanticEquals(src)           => lo(l)
      case EqualTo(l: Literal, a: Attribute) if a.semanticEquals(src) =>
        genLiteral(kind, l, part.dataType).map(EqualTo(part, _))
      case _ => None
    }
  }
}

object GeneratedPartitionPruning {
  /** scan path → discovered graft root (None = not a graft table). Data
    * files are immutable and land under fresh uuid dirs, so entries never
    * go stale; bounded by the distinct scan paths of a session. */
  private val rootCache = TrieMap.empty[String, Option[String]]

  /** (root, version, manifest mtime) → generated-col triples; manifests
    * are immutable, and the mtime epoch invalidates a re-created root. */
  private val genCache =
    TrieMap.empty[(String, Long, Long), Seq[(String, String, String)]]

  /** Test hook: manifest FILES read by the rule since JVM start —
    * repeated planning of the same (root, version) must not move it. */
  val manifestReads = new java.util.concurrent.atomic.AtomicLong
}
