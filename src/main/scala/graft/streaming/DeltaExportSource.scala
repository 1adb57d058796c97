package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamingShims, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.{DeltaDv, LakehouseTable}

/** Micro-batch STREAMING SOURCE over a FOREIGN Delta transaction log —
  * `readStream.format("delta-export").option("path", root)` tails an
  * external `_delta_log` the way Delta's own streaming source does:
  * offsets are log version numbers, the first batch of a fresh stream is
  * the checkpoint-seeded snapshot at the then-current version, and every
  * later batch is exactly the `add` actions of the versions between two
  * offsets, read under the log's schema / column mapping with each add's
  * own deletion vector applied. This closes the interop loop the batch
  * side already has ([[LakehouseTable.readDeltaExport]]): a pipeline can
  * now TAIL a table some other engine is writing, not just snapshot it.
  *
  * Semantics mirror the graft-table source (and Delta's):
  *   - `startingVersion` (inclusive, or `latest`) skips the snapshot and
  *     tails from a log version;
  *   - non-append commits (`remove` actions — COW rewrites, deletes,
  *     OPTIMIZE, DV updates, which Delta commits as remove + re-add) are
  *     REFUSED without `ignoreChanges=true`, because a file-diff batch
  *     would re-emit surviving rows; with it, the range's net adds are
  *     emitted (per-file replay semantics — the documented Delta trade);
  *   - restart safety comes from the engine's offset log alone: log
  *     files and data files are immutable, so a replayed (start, end]
  *     range is bit-identical. No admission anchor is needed — the
  *     source keeps no state.
  *
  * Scale shape: `getOffset` is one log-directory listing; `getBatch`
  * parses only the range's log files (O(range), never O(history) — the
  * schema context seeds from `_last_checkpoint`) and scans only the
  * range's data files. */
class DeltaExportSourceProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "delta-export"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "delta-export source requires .option(\"path\", <table root>)"))

  // one log replay per query START, not one per provider call: the
  // engine calls sourceSchema and then createSource re-derives it —
  // memoize per root within this provider instance (one per query)
  private val schemaMemo = scala.collection.concurrent.TrieMap
    .empty[String, StructType]

  private def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val root = rootOf(parameters)
      val base = schemaMemo.getOrElseUpdate(root,
        LakehouseTable.readDeltaExport(sqlContext.sparkSession, root).schema)
      if (!cdfOf(parameters)) base
      else {
        // Delta's streaming-CDF row shape: data columns + change metadata
        import org.apache.spark.sql.types._
        base.add("_change_type", StringType)
          .add("_commit_version", LongType)
          .add("_commit_timestamp", TimestampType)
      }
    })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    // internal form: the EXCLUSIVE base version (Delta's startingVersion
    // is inclusive — its own adds are the first batch); "latest" tails
    // only future commits
    val startingVersion = parameters.get("startingVersion").map {
      case s if s.equalsIgnoreCase("latest") =>
        LakehouseTable.deltaLogVersions(root).lastOption.getOrElse(-1L)
      case s => s.toLong - 1
    }
    new DeltaExportSource(sqlContext.sparkSession, root,
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean),
      startingVersion = startingVersion,
      readChangeFeed = cdfOf(parameters))
  }
}

class DeltaExportSource(spark: SparkSession, root: String,
    override val schema: StructType, ignoreChanges: Boolean,
    startingVersion: Option[Long] = None,
    readChangeFeed: Boolean = false) extends Source {

  private def versionOf(o: Offset): Long = o match {
    case g: GraftVersionOffset => g.v
    case other                 => GraftVersionOffset.parse(other.json).v
  }

  override def getOffset: Option[Offset] =
    LakehouseTable.deltaLogVersions(root).lastOption.map(GraftVersionOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    def emptyBatch: DataFrame =
      // the planned schema, zero rows — NOT a limit(0) over a full log
      // replay; a no-progress trigger must cost nothing
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // CHANGE-FEED MODE (Delta's readChangeFeed): the initial batch is
    // the snapshot's rows as `insert` changes stamped at its version
    // (Delta's initial-snapshot rule); every later batch is EXACTLY the
    // range's recorded changes — cdc actions, or the derivable
    // insert/delete of cdc-less pure commits — via the same
    // readDeltaExportChanges a foreign table_changes reader uses.
    // Removes never refuse here: CDF records row-level truth, which is
    // the whole point of tailing changes instead of files.
    def cdfStamp(df: DataFrame, v: Long): DataFrame = {
      import org.apache.spark.sql.functions.lit
      val ts = LakehouseTable.deltaCommitTsAt(root, v)
      df.withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp",
          ts.map(t => lit(new java.sql.Timestamp(t)))
            .getOrElse(lit(null)).cast("timestamp"))
    }
    val batch = (start.map(versionOf), startingVersion) match {
      // fresh stream, no declared start: the snapshot at endV — exactly
      // what a foreign batch reader sees at that version
      case (None, None) if readChangeFeed =>
        cdfStamp(LakehouseTable.readDeltaExport(spark, root,
          versionAsOf = Some(endV)), endV)
      case (None, None) =>
        LakehouseTable.readDeltaExport(spark, root, versionAsOf = Some(endV))
      case (s0, sv) =>
        val base = s0.getOrElse(sv.get)
        if (endV <= base) emptyBatch
        else {
          val vs = LakehouseTable.deltaLogVersions(root)
            .filter(w => w > base && w <= endV)
          // vacuum log truncation may have deleted versions this
          // checkpointed stream still owes its sink — losing them
          // silently is data loss; fail and force a restart-from-scratch
          require(vs == (base + 1 to endV),
            s"delta-export stream over $root: log versions " +
              s"${((base + 1) to endV).diff(vs).mkString(",")} were " +
              "truncated by vacuum while this stream was behind. " +
              "Restart the query from scratch.")
          if (readChangeFeed)
            return ForeignSourceAlign.guardAndAlign(spark, "delta-export",
              root, schema,
              LakehouseTable.readDeltaExportChanges(spark, root,
                base + 1, endV))
          // net adds across the range: process each version's removes
          // first (a DV update is remove + re-add of one path in one
          // commit — the re-add's descriptor must win), then its adds;
          // a path removed by a LATER version in the range is net-absent
          val acc = scala.collection.mutable.LinkedHashMap
            .empty[String, Option[DeltaDv.Descriptor]]
          var sawRemove = false
          vs.foreach { v =>
            // dataChange=false actions are pure layout churn (a foreign
            // OPTIMIZE): Delta's own source ignores such commits
            // entirely — they neither emit rows nor refuse the stream
            val (adds, removes) =
              LakehouseTable.deltaActionsDetailedIn(root, v)
            sawRemove ||= removes.exists(_.dataChange)
            removes.filter(_.dataChange).foreach(acc -= _.path)
            adds.filter(_.dataChange).foreach(a => acc(a.path) = a.dv)
          }
          if (sawRemove && !ignoreChanges)
            throw new IllegalStateException(
              s"delta-export stream over $root: versions ($base, $endV] " +
                "contain remove actions (rewrite/delete/OPTIMIZE/DV " +
                "update); a file-diff batch would re-emit surviving " +
                "rows. Restart from scratch or set ignoreChanges=true " +
                "to accept per-file replay semantics.")
          if (acc.isEmpty) emptyBatch
          else LakehouseTable.readDeltaExportFiles(spark, root, acc.toSeq)
        }
    }
    ForeignSourceAlign.guardAndAlign(spark, "delta-export", root,
      schema, batch)
  }

  override def stop(): Unit = ()
}
