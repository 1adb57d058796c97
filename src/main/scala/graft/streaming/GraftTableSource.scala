package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamingShims, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.LakehouseTable

/** Micro-batch STREAMING SOURCE over a graft lakehouse table: offsets are
  * the table's manifest VERSIONS, and each micro-batch is exactly the
  * manifest-diff delta between two committed versions
  * ([[LakehouseTable.readIncremental]] — new files only, never a rescan).
  * The first batch is the full snapshot at the then-current version, then
  * the source tails commits: append N rows → one micro-batch of exactly
  * those N rows. This is Delta's streaming-source design (reservoir
  * version offsets + AddFile tailing) expressed over the graft manifest.
  *
  * Restart safety comes from the engine's own offset log: the checkpoint
  * stores the version reached, `getBatch(Some(v5), v7)` after a restart
  * re-reads files added in (v5, v7] and nothing else — the data files are
  * immutable, so a replayed range is bit-identical. Non-append
  * transitions (COW delete / merge / overwrite rewrote or dropped files)
  * are REFUSED by default, like Delta without `ignoreChanges`: a file
  * diff would re-emit every surviving row of a rewritten file. Pass
  * `.option("ignoreChanges", "true")` to tail the added files anyway
  * (per-file replay semantics, rewritten rows re-emitted — the documented
  * Delta trade).
  *
  * Scale shape: `getOffset` is one manifest-dir listing; `getBatch` is
  * two manifest reads + a scan of ONLY the new files. Nothing is
  * proportional to table size except the initial snapshot.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft-table")            // or the provider's class name
  *     .option("path", tableRoot)
  *     .load()
  * }}}
  */
class GraftTableSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-table source requires .option(\"path\", <table root>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      LakehouseTable.read(sqlContext.sparkSession, rootOf(parameters)).schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftTableSource(sqlContext.sparkSession, rootOf(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean),
      maxVersionsPerBatch = parameters.get("maxVersionsPerBatch").map { v =>
        val n = v.toInt
        require(n >= 1, s"maxVersionsPerBatch must be >= 1, got $n")
        n
      },
      metadataPath = Some(metadataPath))
}

/** Version offset for [[GraftTableSource]]: `json` is the bare version
  * number, so the engine's checkpointed `SerializedOffset` round-trips
  * with a `.toLong`. */
case class GraftVersionOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

class GraftTableSource(spark: SparkSession, root: String,
    override val schema: StructType, ignoreChanges: Boolean,
    maxVersionsPerBatch: Option[Int] = None,
    metadataPath: Option[String] = None) extends Source {

  private def versionOf(o: Offset): Long = o match {
    case GraftVersionOffset(v) => v
    case other                 => other.json.trim.toLong // SerializedOffset
  }

  private def anchorFile: Option[java.nio.file.Path] =
    metadataPath.map(m => java.nio.file.Paths.get(m, "graft-last-planned"))

  /** End version of the last batch this source PLANNED — the anchor the
    * admission cap counts from. Persisted under the source's
    * metadataPath (atomic move) so the cap survives a restart: without
    * that, the first post-restart batch of a long backlog would be one
    * giant catch-up batch (the DSv1 wrinkle Delta's maxFilesPerTrigger
    * has — getOffset runs before any getBatch reveals the checkpointed
    * position). Lost/absent state degrades to exactly that documented
    * behavior, never to wrong data: the cap is admission control only. */
  @volatile private var lastPlannedEnd: Option[Long] =
    anchorFile.filter(java.nio.file.Files.exists(_)).flatMap { f =>
      scala.util.Try(
        new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim.toLong
      ).toOption
    }

  private def persistAnchor(v: Long): Unit = anchorFile.foreach { f =>
    try {
      java.nio.file.Files.createDirectories(f.getParent)
      val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp, v.toString.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, f,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case _: Throwable =>
        // A STALE anchor is the one dangerous state: an anchor behind the
        // engine's committed offset caps getOffset below the stream's
        // position and stalls it permanently. If we cannot advance the
        // file, remove it — a restart then degrades to one uncapped
        // catch-up batch (the documented no-anchor behavior), never to a
        // stall. Admission state only; never fail a batch over it.
        try java.nio.file.Files.deleteIfExists(f) catch { case _: Throwable => () }
    }
  }

  /** Latest committed version — the engine plans a batch whenever this
    * advances past the last processed offset. With
    * `maxVersionsPerBatch=n`, a long backlog (a backfill, a restarted
    * stream behind a busy table) is admitted n manifest versions at a
    * time instead of as one giant catch-up batch — bounded batch size,
    * bounded per-batch file lists, steady checkpoint progress. */
  override def getOffset: Option[Offset] =
    LakehouseTable.currentVersion(root).map { v =>
      val capped = (lastPlannedEnd, maxVersionsPerBatch) match {
        case (Some(last), Some(max)) => math.min(v, last + max)
        case _                       => v
      }
      GraftVersionOffset(capped)
    }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    lastPlannedEnd = Some(endV)
    persistAnchor(endV)
    val batch = start match {
      // first batch of a fresh query: the full snapshot at endV (Delta's
      // initial reservoir read)
      case None => LakehouseTable.read(spark, root, Some(endV))
      case Some(s) =>
        val fromV = versionOf(s)
        if (fromV >= endV)
          LakehouseTable.read(spark, root, Some(endV)).limit(0)
        else {
          if (!ignoreChanges &&
              LakehouseTable.removedFilesBetween(root, fromV, endV).nonEmpty)
            throw new IllegalStateException(
              s"graft-table stream over $root: versions ($fromV, $endV] " +
                "rewrote or dropped data files (delete/merge/overwrite/" +
                "compact); a file-diff batch would re-emit surviving rows. " +
                "Restart from scratch or set ignoreChanges=true to accept " +
                "per-file replay semantics.")
          // a MERGE-ON-READ delete changes no files — it changes a carried
          // file's deletion-vector entry, retroactively deleting rows this
          // stream already emitted. A file-diff batch cannot represent
          // that; refuse like the rewrite case (Delta without
          // ignoreDeletes has the same contract).
          if (!ignoreChanges &&
              LakehouseTable.dvsAt(root, endV) !=
                LakehouseTable.dvsAt(root, fromV))
            throw new IllegalStateException(
              s"graft-table stream over $root: versions ($fromV, $endV] " +
                "changed deletion vectors (MOR delete); already-emitted " +
                "rows were retroactively deleted. Restart from scratch or " +
                "set ignoreChanges=true to skip the deletions.")
          LakehouseTable.readIncremental(spark, root, fromV, Some(endV))
        }
    }
    // the engine requires every batch to match the schema it planned at
    // start. A COLUMN the batch lost, or a TYPE that changed (ALTER
    // COLUMN TYPE widening mid-stream), cannot be cast away silently —
    // a double→float down-cast would truncate values the table now
    // legitimately holds. Fail like Delta's source does; a restart picks
    // up the new schema from the table.
    // a DECLARED column the table no longer carries (ALTER DROP, or the
    // physical side of a RENAME) is a non-additive schema change — a
    // silent null-fill would corrupt downstream state; fail like the
    // type-change case. (A column merely absent from THIS batch's files
    // — a ragged append — still null-fills below, as the batch read
    // itself would.)
    val droppedNow = LakehouseTable.droppedColumnsAt(root, endV)
      .map(_.toLowerCase).toSet
    val renamedAway = LakehouseTable.renamedColumnsAt(root, endV)
      .map(_._1.toLowerCase).toSet
    schema.foreach { f =>
      if (droppedNow.contains(f.name.toLowerCase) ||
          renamedAway.contains(f.name.toLowerCase))
        throw new IllegalStateException(
          s"graft-table stream over $root: column '${f.name}' was " +
            "dropped or renamed mid-stream. Restart the query to adopt " +
            "the new schema.")
      batch.schema.find(_.name.equalsIgnoreCase(f.name)).foreach { a =>
        if (a.dataType != f.dataType)
          throw new IllegalStateException(
            s"graft-table stream over $root: column '${f.name}' changed " +
              s"type ${f.dataType.sql} -> ${a.dataType.sql} mid-stream " +
              "(ALTER COLUMN TYPE). Restart the query to adopt the new " +
              "schema.")
      }
    }
    val aligned = batch.select(schema.map(f =>
      (if (batch.columns.exists(_.equalsIgnoreCase(f.name))) col(f.name)
       else lit(null)).cast(f.dataType).as(f.name)).toSeq: _*)
    GraftStreamingShims.streamingDataFrame(spark, aligned)
  }

  override def stop(): Unit = ()
}
