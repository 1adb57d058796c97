package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamingShims, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.IcebergMeta

/** Micro-batch STREAMING SOURCE over a FOREIGN Iceberg chain —
  * `readStream.format("iceberg-export").option("path", root)` tails the
  * snapshot lineage the way Iceberg's own incremental-append scan does:
  * offsets are snapshot SEQUENCE NUMBERS, the first batch of a fresh
  * stream is the snapshot at the then-current sequence, and every later
  * batch is exactly the data files ADDED by the range's snapshots
  * (manifest entries whose added_snapshot_id is the snapshot's own —
  * O(range), never a chain replay), read under the current metadata
  * schema. The delta-export source's twin, for the second open format.
  *
  * Semantics:
  *   - `startingVersion` (inclusive sequence number, or `latest`) skips
  *     the snapshot and tails from a lineage position;
  *     `startingTimestamp` resolves the same through the chain's own
  *     snapshot timestamps (first snapshot at/after the stamp, parsed
  *     under the session timezone);
  *   - non-append snapshots (operation `overwrite` — COW rewrites,
  *     compaction — or `delete` — row-level delete-file changes) are
  *     REFUSED without `ignoreChanges=true`: an added-files batch would
  *     re-emit surviving rows of rewritten files and cannot represent
  *     retroactive deletions. With it, the range nets: a chain-REWRITE
  *     snapshot (deleted-data-files > 0) supersedes earlier in-range
  *     adds (its manifest lists every live file, so the replay unit is
  *     the rewrite — coarser than Delta's per-file net), and the
  *     range-end snapshot's position-delete files are applied so
  *     replayed rows are the SURVIVORS, never resurrected deletions;
  *   - restart safety comes from the engine's offset log alone —
  *     snapshots, manifests, and data files are immutable, so a
  *     replayed (start, end] range is bit-identical. */
class IcebergExportSourceProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "iceberg-export"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "iceberg-export source requires .option(\"path\", <table root>)"))

  // sourceSchema + createSource both need it; one chain read per start
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
        IcebergMeta.readIceberg(sqlContext.sparkSession, root).schema)
      if (!cdfOf(parameters)) base
      else {
        // the batch changelog's row shape: data columns + change type +
        // the Iceberg-native commit stamps (a Delta-parity consumer
        // derives its version as sequence - 1)
        import org.apache.spark.sql.types._
        base.add("_change_type", StringType)
          .add("_commit_snapshot_id", LongType)
          .add("_sequence_number", LongType)
          .add("_commit_timestamp", TimestampType)
      }
    })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    // internal form: the EXCLUSIVE base sequence (a declared start's own
    // adds are the first batch); "latest" tails only future snapshots
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "startingVersion and startingTimestamp are mutually exclusive")
    val startingSeq = parameters.get("startingVersion").map {
      case s if s.equalsIgnoreCase("latest") =>
        if (IcebergMeta.hasChain(root))
          IcebergMeta.snapshots(root).map(_.seq).maxOption.getOrElse(0L)
        else 0L
      case s => s.toLong - 1
    }.orElse(parameters.get("startingTimestamp").map { t =>
      // tail from the first snapshot committed AT OR AFTER the stamp,
      // resolved through the chain's own snapshot timestamps and parsed
      // under the SESSION timezone (the graft-table source's rule — a
      // JVM-default parse would move the start point by the host offset);
      // a stamp past the tip tails only future snapshots
      val tz = java.time.ZoneId.of(
        sqlContext.sparkSession.sessionState.conf.sessionLocalTimeZone)
      val norm = t.trim.replace(' ', 'T')
      val ldt =
        try {
          if (norm.contains('T')) java.time.LocalDateTime.parse(norm)
          else java.time.LocalDate.parse(norm).atStartOfDay()
        } catch {
          case _: java.time.format.DateTimeParseException =>
            java.sql.Timestamp.valueOf(t.trim.replace('T', ' '))
              .toLocalDateTime
        }
      val stamp = ldt.atZone(tz).toInstant.toEpochMilli
      val snaps = IcebergMeta.snapshots(root)
      snaps.find(_.ts >= stamp).map(_.seq - 1)
        .getOrElse(snaps.map(_.seq).maxOption.getOrElse(0L))
    })
    // CHANGE-FEED MODE: row-level changes derived from the chain alone
    // (the batch icebergChangelog, tailed). Keys come from an explicit
    // .option("keys", "a,b"), falling back to the graft manifest's cdf
    // key list when the chain is graft's own mirror — a pure-foreign
    // chain has no manifest to consult, so keys are then required.
    val cdf = cdfOf(parameters)
    val cdfKeys: Seq[String] =
      if (!cdf) Nil
      else parameters.get("keys")
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(IcebergMeta.graftCdfKeys(root).getOrElse(Nil))
    if (cdf) require(cdfKeys.nonEmpty,
      s"iceberg-export source readChangeFeed over $root needs row keys: " +
        "pass .option(\"keys\", \"k1,k2\") (or mirror a graft table " +
        "whose change feed is enabled)")
    new IcebergExportSource(sqlContext.sparkSession, root,
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean),
      startingSeq = startingSeq,
      readChangeFeed = cdf,
      cdfKeys = cdfKeys)
  }
}

class IcebergExportSource(spark: SparkSession, root: String,
    override val schema: StructType, ignoreChanges: Boolean,
    startingSeq: Option[Long] = None,
    readChangeFeed: Boolean = false,
    cdfKeys: Seq[String] = Nil) extends Source {

  private def seqOf(o: Offset): Long = o match {
    case g: GraftVersionOffset => g.v
    case other                 => GraftVersionOffset.parse(other.json).v
  }

  override def getOffset: Option[Offset] =
    if (!IcebergMeta.hasChain(root)) None
    else IcebergMeta.snapshots(root).map(_.seq).maxOption
      .map(GraftVersionOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endSeq = seqOf(end)
    def emptyBatch: DataFrame =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // CHANGE-FEED MODE: the initial batch is the snapshot's rows as
    // `insert` changes stamped at its own snapshot (the rule the other
    // two CDF sources follow); every later batch is EXACTLY the range's
    // derived changelog — the same icebergChangelog a batch reader uses,
    // so stream ≡ batch by construction. Non-append snapshots never
    // refuse here: the changelog records row-level truth, which is the
    // point of tailing changes instead of files.
    def cdfStamp(df: DataFrame, s: IcebergMeta.SnapshotInfo): DataFrame = {
      import org.apache.spark.sql.functions.lit
      df.withColumn("_change_type", lit("insert"))
        .withColumn("_commit_snapshot_id", lit(s.id))
        .withColumn("_sequence_number", lit(s.seq))
        .withColumn("_commit_timestamp",
          lit(new java.sql.Timestamp(s.ts)))
    }
    val batch = (start.map(seqOf), startingSeq) match {
      // fresh stream, no declared start: the snapshot at endSeq
      case (None, None) =>
        val snap = IcebergMeta.snapshots(root).find(_.seq == endSeq)
          .getOrElse(throw new IllegalStateException(
            s"no Iceberg snapshot at sequence $endSeq under $root"))
        val st = IcebergMeta.readIceberg(spark, root,
          snapshotAsOf = Some(snap.id))
        if (readChangeFeed) cdfStamp(st, snap) else st
      case (s0, sv) =>
        val base = s0.getOrElse(sv.get)
        if (endSeq <= base) emptyBatch
        else {
          val range = IcebergMeta.snapshots(root)
            .filter(s => s.seq > base && s.seq <= endSeq)
          // snapshot expiry may have trimmed sequences this checkpointed
          // stream still owes its sink — fail loudly, never skip
          require(range.map(_.seq) == (base + 1 to endSeq),
            s"iceberg-export stream over $root: snapshot sequences " +
              s"${((base + 1) to endSeq).diff(range.map(_.seq)).mkString(",")} " +
              "were expired while this stream was behind. Restart the " +
              "query from scratch.")
          if (readChangeFeed)
            return ForeignSourceAlign.guardAndAlign(spark, "iceberg-export",
              root, schema,
              IcebergMeta.icebergChangelog(spark, root, base, endSeq,
                cdfKeys))
          val nonAppend = range.filterNot(_.operation == "append")
          if (nonAppend.nonEmpty && !ignoreChanges)
            throw new IllegalStateException(
              s"iceberg-export stream over $root: sequences " +
                s"($base, $endSeq] contain non-append snapshots " +
                s"(${nonAppend.map(_.operation).distinct.mkString(",")}); " +
                "an added-files batch would re-emit surviving rows or " +
                "skip retroactive deletes. Restart from scratch or set " +
                "ignoreChanges=true to accept per-file replay semantics.")
          // net the range: a snapshot that REWROTE the manifest chain
          // (deleted-data-files > 0 — its own manifest lists the whole
          // live set) SUPERSEDES everything earlier in the range, or an
          // in-range append followed by its compaction would emit rows
          // twice; mixed add+delete commits just contribute their adds
          var acc = Vector.empty[String]
          range.foreach { sn =>
            val adds = IcebergMeta.snapshotAddedFiles(root, sn.id)
            if (sn.operation == "overwrite" && sn.deletedDataFiles > 0)
              acc = adds.toVector
            else acc = acc ++ adds
          }
          val files = acc.distinct
          if (files.isEmpty) emptyBatch
          else IcebergMeta.readIcebergFiles(spark, root, files,
            // a non-append range may carry retroactive MOR deletes on
            // the emitted files — apply the range-end snapshot's delete
            // state so replayed rows are the SURVIVORS, as the
            // delta-export twin's per-add DV application does
            deletesOfSnapshot =
              if (nonAppend.nonEmpty) Some(range.last.id) else None)
        }
    }
    ForeignSourceAlign.guardAndAlign(spark, "iceberg-export", root,
      schema, batch)
  }

  override def stop(): Unit = ()
}
