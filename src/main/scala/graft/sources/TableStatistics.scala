package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

/** ANALYZE TABLE for the planner: table-level row counts and per-column
  * NDV / min / max / null counts, persisted next to the table
  * (`_graft_stats.json`, atomic tmp+rename like every other commit
  * artifact) and attached to the read plan's `LogicalRelation` as
  * `CatalogStatistics` — exactly the shape Spark's cost-based optimizer
  * consumes (`spark.sql.cbo.enabled` + filter/join estimation +
  * `joinReorder`). With CBO off (the default) the attachment is inert:
  * `toPlanStats` falls back to size-only, so plans are bit-identical to
  * the un-analyzed read.
  *
  * STALENESS DISCIPLINE: stats record the VERSION they were computed at
  * and are attached only when the read serves that same version — a
  * commit silently un-arms them (re-run ANALYZE to re-arm) rather than
  * letting a delete's stale row count mis-estimate a join side. This is
  * stricter than Hive/Delta (which serve stale stats); the refusal
  * family this engine prefers.
  *
  * Scale shape: one aggregation pass over the table computes every
  * column's stats (approx_count_distinct = the same HLL Spark's own
  * ANALYZE uses); the result is a single small JSON on the driver.
  * Attachment is a cached file probe + an analyzed-plan transform. */
object TableStatistics {

  final case class ColStat(distinctCount: Long, nullCount: Long,
      min: Option[String], max: Option[String],
      avgLen: Long, maxLen: Long)

  final case class TableStats(version: Long, rowCount: Long,
      sizeInBytes: Long, cols: Map[String, ColStat])

  private def statsPath(root: String) = Paths.get(root, "_graft_stats.json")

  /** min/max are recorded only for types whose external string form
    * round-trips losslessly through CatalogColumnStat. */
  private def minMaxable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DoubleType |
         FloatType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  private def atomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | BinaryType => false
    case _ => true
  }

  /** Compute + persist statistics for the CURRENT version. `columns`
    * empty = all eligible (atomic) columns. Returns what was written. */
  def analyze(spark: SparkSession, root: String,
      columns: Seq[String] = Nil): TableStats = {
    import org.apache.spark.sql.functions._
    val v = LakehouseTable.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no table at $root"))
    val df = LakehouseTable.read(spark, root, Some(v))
    val eligible = df.schema.fields.filter(f => atomic(f.dataType))
      .filter(f => columns.isEmpty ||
        columns.exists(_.equalsIgnoreCase(f.name)))
    val unknown = columns.filterNot(c =>
      df.schema.fields.exists(_.name.equalsIgnoreCase(c)))
    require(unknown.isEmpty,
      s"ANALYZE: column(s) ${unknown.mkString(", ")} not in the table at $root")
    val aggs = Seq(count(lit(1)).as("__n")) ++ eligible.flatMap { f =>
      val c = col(f.name)
      Seq(approx_count_distinct(c).as(s"__ndv__${f.name}"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nul__${f.name}")) ++
      (if (minMaxable(f.dataType))
         Seq(min(c).cast("string").as(s"__min__${f.name}"),
           max(c).cast("string").as(s"__max__${f.name}"))
       else Nil) ++
      (if (f.dataType == StringType)
         Seq(avg(length(c)).as(s"__avl__${f.name}"),
           max(length(c)).as(s"__mxl__${f.name}"))
       else Nil)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def opt[T](name: String): Option[T] =
      if (!row.schema.fieldNames.contains(name)) None
      else {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) None else Some(row.getAs[T](i))
      }
    val n = row.getAs[Long]("__n")
    val cols = eligible.map { f =>
      val defaultLen = f.dataType.defaultSize.toLong
      val avgLen = opt[Double](s"__avl__${f.name}")
        .map(d => math.max(1L, math.round(d))).getOrElse(defaultLen)
      val maxLen = opt[Int](s"__mxl__${f.name}").map(_.toLong)
        .getOrElse(defaultLen)
      f.name -> ColStat(
        distinctCount = row.getAs[Long](s"__ndv__${f.name}"),
        nullCount = row.getAs[Long](s"__nul__${f.name}"),
        min = opt[String](s"__min__${f.name}"),
        max = opt[String](s"__max__${f.name}"),
        avgLen = avgLen, maxLen = maxLen)
    }.toMap
    val size = LakehouseTable.manifestFiles(root, v)
      .map(LakehouseTable.dataFileSize(root, _)).sum
    val stats = TableStats(v, n, math.max(size, 1L), cols)
    write(root, stats)
    stats
  }

  /** EXACT table-level advance across a PURE APPEND: the appended
    * files' row count and size are known at commit time (parquet
    * footers + file sizes, O(new files)), so rowCount/sizeInBytes stay
    * exact instead of un-arming — a continuously-appended table (every
    * streaming ingest target) keeps its join-cardinality stats armed
    * across micro-batches. Column stats do NOT survive (the new rows'
    * min/max/NDV are unknown without a scan): they drop, and filter
    * estimation falls back to row-count-based until the next ANALYZE.
    * Deletes/merges/overwrites still un-arm completely (their removed
    * row counts are not knowable from the commit alone). No-op unless
    * stats exist and were exact at the pre-append version — a
    * concurrent writer that slipped in between leaves them un-armed,
    * never wrong. */
  private[sources] def advanceForAppend(root: String, prevV: Long,
      newV: Long, addedRows: => Long, addedBytes: => Long): Unit =
    statsOf(root).filter(_.version == prevV).foreach { st =>
      write(root, TableStats(newV, st.rowCount + addedRows,
        st.sizeInBytes + addedBytes, Map.empty))
    }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def jstr(s: String): String = mapper.writeValueAsString(s)

  private def write(root: String, st: TableStats): Unit = {
    val colsJson = st.cols.toSeq.sortBy(_._1).map { case (name, c) =>
      jstr(name) + ":{" +
        s""""ndv":${c.distinctCount},"nulls":${c.nullCount},""" +
        c.min.map(m => s""""min":${jstr(m)},""").getOrElse("") +
        c.max.map(m => s""""max":${jstr(m)},""").getOrElse("") +
        s""""avgLen":${c.avgLen},"maxLen":${c.maxLen}}"""
    }.mkString("{", ",", "}")
    val json = s"""{"version":${st.version},"rowCount":${st.rowCount},""" +
      s""""sizeInBytes":${st.sizeInBytes},"cols":$colsJson}"""
    val p = statsPath(root)
    val tmp = Files.createTempFile(p.getParent, ".stats-tmp", ".json")
    Files.writeString(tmp, json)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    cache.remove(root)
  }

  // (root → (mtime, parsed)) — the read path probes on every query
  private val cache = TrieMap.empty[String, (Long, Option[TableStats])]

  /** Parsed stats if present (cached by file mtime). */
  def statsOf(root: String): Option[TableStats] = {
    val p = statsPath(root)
    if (!Files.exists(p)) None
    else {
      val mt = Files.getLastModifiedTime(p).toMillis
      cache.get(root) match {
        case Some((m, st)) if m == mt => st
        case _ =>
          val parsed = scala.util.Try {
            val n = mapper.readTree(Files.readString(p))
            val cols = n.get("cols").properties().asScala.map { e =>
              val c = e.getValue
              e.getKey -> ColStat(
                c.get("ndv").asLong(), c.get("nulls").asLong(),
                Option(c.get("min")).map(_.asText()),
                Option(c.get("max")).map(_.asText()),
                c.get("avgLen").asLong(), c.get("maxLen").asLong())
            }.toMap
            TableStats(n.get("version").asLong(), n.get("rowCount").asLong(),
              n.get("sizeInBytes").asLong(), cols)
          }.toOption
          cache.put(root, (mt, parsed))
          parsed
      }
    }
  }

  /** Attach persisted stats to `df`'s scan relation when they were
    * computed at exactly the version being read; identity otherwise. */
  private[graft] def attach(spark: SparkSession, df: DataFrame,
      root: String, v: Long): DataFrame =
    statsOf(root).filter(_.version == v) match {
      case None => df
      case Some(st) =>
        val colStats: Map[String, CatalogColumnStat] = st.cols.collect {
          case (name, c) =>
            name -> CatalogColumnStat(
              distinctCount = Some(BigInt(c.distinctCount)),
              min = c.min, max = c.max,
              nullCount = Some(BigInt(c.nullCount)),
              avgLen = Some(c.avgLen), maxLen = Some(c.maxLen))
        }
        val catStats = CatalogStatistics(
          sizeInBytes = BigInt(st.sizeInBytes),
          rowCount = Some(BigInt(st.rowCount)),
          colStats = colStats)
        val analyzed = df.queryExecution.analyzed
        // Stamp ONLY the table's data-file scan: a MOR read's plan also
        // carries the deletion-vector relation (applyDvs' anti-join
        // side, under root/deletes/), which must NOT inherit the
        // table's rowCount — CBO would size the anti-join's tiny side
        // like the whole table and mis-order every downstream join.
        val dataPrefix = Paths.get(root, "data").toUri.getPath
        def isDataScan(lr: LogicalRelation): Boolean = lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.nonEmpty &&
              fs.location.rootPaths.forall(_.toUri.getPath.startsWith(dataPrefix))
          case _ => false
        }
        val withStats = analyzed.transform {
          case lr: LogicalRelation
              if lr.catalogTable.isEmpty && isDataScan(lr) =>
            lr.copy(catalogTable = Some(CatalogTable(
              identifier = TableIdentifier(
                "graft_" + graft.plans.TextExpressions.md5Hex(root).take(12)),
              tableType = CatalogTableType.EXTERNAL,
              storage = CatalogStorageFormat.empty.copy(
                locationUri = Some(Paths.get(root).toUri)),
              schema = StructType(lr.output.map(a =>
                StructField(a.name, a.dataType, a.nullable))),
              provider = Some("parquet"),
              stats = Some(catStats))))
        }
        org.apache.spark.sql.GraftStreamingShims
          .dataFrameFromPlan(spark, withStats)
    }
}
