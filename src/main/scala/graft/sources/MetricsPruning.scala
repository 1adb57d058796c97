package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._

/** The INCLUSIVE metrics evaluator shared by both open-format faces'
  * scan planning (`IcebergMeta.pruneFiles` over manifest partition
  * values + column bounds, `LakehouseTable.readDeltaExport` over the
  * log's per-file stats JSON): given a parsed predicate and what a
  * file's metadata says about each referenced column, decide whether
  * the file COULD contain a matching row. Driver-side, O(files) —
  * never a data scan. One body, so the two faces' edge rules (NaN
  * ordering, UTF-8 string order, conservative unknowns) cannot fork.
  *
  * Sharp edges the leaf rules encode:
  *   - SQL engines (Spark, DuckDB) order NaN ABOVE every value, so a
  *     floating column's UPPER bound prunes `x > v` only when the file
  *     is known nan-free; lower bounds are safe either way.
  *   - Strings compare by UNSIGNED UTF-8 BYTES — the order parquet
  *     byte bounds are merged under AND the order Spark's UTF8String
  *     row comparison uses; java String.compareTo (UTF-16 code units)
  *     disagrees for supplementary-plane text and would wrongly prune.
  *   - Everything unknown (missing metadata, non-finite endpoints,
  *     unsupported predicate shapes) keeps the file; callers apply the
  *     predicate as a residual row filter over whatever planning kept.
  */
private[sources] object MetricsPruning {

  /** What a file's metadata knows about one column: a normalized
    * [lo, hi] range (BigDecimal for numeric/temporal/boolean, String
    * for strings; None = unknown), whether every value is null,
    * whether none are, and whether the file is known to hold no NaN
    * (always true for non-floating columns). `eqKeep` is the
    * EQUALITY-ONLY hook for metadata with no order information —
    * Iceberg `bucket[N]` partition values: given the RAW Catalyst
    * literal, false means the file provably holds no equal row; it is
    * consulted only by `=`/`IN` leaves (a bucket value bounds nothing
    * for ranges) and defaults to keep. */
  case class ColMeta(lo: Option[Any], hi: Option[Any],
      allNull: Boolean, noNulls: Boolean, nanFree: Boolean,
      eqKeep: Any => Boolean = _ => true)

  def finite(n: java.lang.Number): Boolean = n match {
    case d: java.lang.Double => !d.isNaN && !d.isInfinite
    case f: java.lang.Float => !f.isNaN && !f.isInfinite
    case _ => true
  }

  /** FLOATING bounds take ONE ULP of slack before entering the exact-
    * decimal evaluator. Spark compares float/double rows in DOUBLE
    * space, where every decimal text within half an ulp of the value
    * is EQUAL to it — but the evaluator compares exact decimals, so a
    * shortest-repr bound ("1.100000023841858") tested against a
    * literal's decimal text ("1.1000000238418579", the same double)
    * can misorder by under an ulp and wrongly prune a matching
    * equality. Widening each bound one ulp outward keeps every such
    * literal: at most one marginal file kept, never a wrong prune. */
  def floatLo(d: Double): Option[Any] = {
    val w = Math.nextDown(d)
    if (d.isNaN || d.isInfinite || w.isInfinite) None
    else Some(BigDecimal(w.toString))
  }
  def floatHi(d: Double): Option[Any] = {
    val w = Math.nextUp(d)
    if (d.isNaN || d.isInfinite || w.isInfinite) None
    else Some(BigDecimal(w.toString))
  }

  /** Catalyst literal (internal representation) → normalized
    * comparable; None = no comparable form (conservative). */
  def normLit(v: Any): Option[Any] = v match {
    case null => None
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toBigDecimal)
    case b: java.lang.Boolean => Some(BigDecimal(if (b) 1 else 0))
    case n: java.lang.Number if finite(n) => Some(BigDecimal(n.toString))
    case _ => None
  }

  def utf8Cmp(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: String, y: String) => Some(utf8Cmp(x, y))
    case _ => None
  }

  /** Parse `expr` and refuse a predicate referencing columns the
    * schema does not have — a typo must not silently scan (or worse,
    * keep) everything. Returns the parsed tree. */
  def parseChecked(spark: SparkSession, expr: String,
      schemaNames: Set[String], schemaDesc: String): Expression = {
    val parsed = spark.sessionState.sqlParser.parseExpression(expr)
    val refs = parsed.references.map(_.name.toLowerCase).toSet
    require(refs.nonEmpty && refs.subsetOf(schemaNames),
      s"pruneWhere references column(s) ${refs.diff(schemaNames).toSeq
        .sorted.mkString(", ")} not in the table schema " +
      s"($schemaDesc); got: $expr")
    parsed
  }

  /** An INCLUSIVE planning predicate for "this row's keys match SOME
    * source row" — the candidate-file planner of the foreign MERGE:
    * per key column, the source's [min, max] (ONE agg job; the driver
    * sync is 3 values per key + a count, source-size-independent),
    * OR'd with IS NULL when the source carries a null key (merge
    * matches null-safely). Built as Catalyst nodes, never SQL text —
    * `lit()` puts each collected value into the exact internal form
    * (epoch micros/days for temporal keys) whose `normLit` image is
    * the faces' stats norm space, so no literal quoting/formatting
    * round-trip can corrupt a bound. Key columns whose type has no
    * ordered metadata form (binary, nested) contribute no constraint;
    * returns (None, n) when nothing constrains — scan every live
    * file, correct and conservative. NaN floating keys surface as
    * non-finite bounds `normLit` refuses: the leaf keeps the file.
    * The returned count is the source's row count; callers MUST
    * short-circuit count == 0 before using the predicate (an empty
    * source yields null bounds, which read as "no constraint"). */
  def keyBoundsPredicate(src: org.apache.spark.sql.DataFrame,
      keys: Seq[String]): (Option[Expression], Long) = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    import org.apache.spark.sql.types._
    def kcol(k: String) = col("`" + k.replace("`", "``") + "`")
    val supported = keys.filter { k =>
      src.schema.fields.find(_.name.equalsIgnoreCase(k))
        .map(_.dataType).exists {
          case _: NumericType => true
          case StringType | DateType | TimestampType | BooleanType => true
          case _ => false
        }
    }
    val aggCols = supported.flatMap { k =>
      Seq(min(kcol(k)).as(s"__lo_$k"), max(kcol(k)).as(s"__hi_$k"),
        max(kcol(k).isNull.cast("int")).as(s"__nl_$k"))
    } :+ count(lit(1)).as("__n")
    val row = src.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    val perKey: Seq[Expression] = supported.flatMap { k =>
      val attr = UnresolvedAttribute.quoted(k)
      val lo = row.getAs[Any](s"__lo_$k")
      val hi = row.getAs[Any](s"__hi_$k")
      val hasNull = Option(row.getAs[Any](s"__nl_$k")).exists(_ == 1)
      // Literal.apply converts the collected EXTERNAL value to the
      // internal form (UTF8String / epoch micros / epoch days) whose
      // normLit image is the faces' stats norm space
      val range: Option[Expression] =
        if (lo == null || hi == null) None
        else Some(And(GreaterThanOrEqual(attr, Literal(lo)),
          LessThanOrEqual(attr, Literal(hi))))
      (range, hasNull) match {
        case (Some(r), true)  => Some(Or(r, IsNull(attr)))
        case (Some(r), false) => Some(r)
        case (None, true)     => Some(IsNull(attr)) // all-null key col
        case (None, false)    => None // empty source / no bounds
      }
    }
    (if (perKey.isEmpty) None else Some(perKey.reduce(And(_, _))), n)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last.toLowerCase)
    case _ => None
  }

  // inclusive leaf checks: true = the file COULD contain a match
  private def leaf(m: ColMeta, v: Any, op: String): Boolean = {
    if (m.allNull) return false // no non-null value can satisfy any op
    normLit(v).fold(true) { lv =>
      op match {
        case "=" => m.lo.flatMap(cmp(_, lv)).forall(_ <= 0) &&
          m.hi.flatMap(cmp(_, lv)).forall(_ >= 0) && m.eqKeep(v)
        case "<" => m.lo.flatMap(cmp(_, lv)).forall(_ < 0)
        case "<=" => m.lo.flatMap(cmp(_, lv)).forall(_ <= 0)
        // a NaN row satisfies every `x > v` under NaN-greatest
        // ordering, so hi prunes these only on a nan-free file
        case ">" => !m.nanFree ||
          m.hi.flatMap(cmp(_, lv)).forall(_ > 0)
        case ">=" => !m.nanFree ||
          m.hi.flatMap(cmp(_, lv)).forall(_ >= 0)
      }
    }
  }

  /** Evaluate the parsed predicate against one file's column metadata:
    * true = keep (could match), false = the file provably holds no
    * matching row. */
  def canMatch(e: Expression, metaFor: String => ColMeta): Boolean =
    e match {
      case And(l, r) => canMatch(l, metaFor) && canMatch(r, metaFor)
      case Or(l, r) => canMatch(l, metaFor) || canMatch(r, metaFor)
      case EqualTo(a, Literal(v, _)) if attrName(a).isDefined =>
        leaf(metaFor(attrName(a).get), v, "=")
      case EqualTo(Literal(v, _), a) if attrName(a).isDefined =>
        leaf(metaFor(attrName(a).get), v, "=")
      case LessThan(a, Literal(v, _)) if attrName(a).isDefined =>
        leaf(metaFor(attrName(a).get), v, "<")
      case LessThan(Literal(v, _), a) if attrName(a).isDefined =>
        leaf(metaFor(attrName(a).get), v, ">")
      case LessThanOrEqual(a, Literal(v, _)) if attrName(a).isDefined =>
        leaf(metaFor(attrName(a).get), v, "<=")
      case LessThanOrEqual(Literal(v, _), a) if attrName(a).isDefined =>
        leaf(metaFor(attrName(a).get), v, ">=")
      case GreaterThan(a, Literal(v, _)) if attrName(a).isDefined =>
        leaf(metaFor(attrName(a).get), v, ">")
      case GreaterThan(Literal(v, _), a) if attrName(a).isDefined =>
        leaf(metaFor(attrName(a).get), v, "<")
      case GreaterThanOrEqual(a, Literal(v, _)) if attrName(a).isDefined =>
        leaf(metaFor(attrName(a).get), v, ">=")
      case GreaterThanOrEqual(Literal(v, _), a) if attrName(a).isDefined =>
        leaf(metaFor(attrName(a).get), v, "<=")
      case In(a, vs) if attrName(a).isDefined &&
          vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(l => leaf(metaFor(attrName(a).get),
          l.asInstanceOf[Literal].value, "="))
      case IsNull(a) if attrName(a).isDefined =>
        !metaFor(attrName(a).get).noNulls
      case IsNotNull(a) if attrName(a).isDefined =>
        !metaFor(attrName(a).get).allNull
      case _ => true // unsupported shape: keep, the residual filters rows
    }
}
