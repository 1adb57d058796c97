package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, GraftStreamingShims, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.LakehouseTable

/** Micro-batch STREAMING SOURCE over a graft lakehouse table: offsets are
  * cursors into the table's manifest history — a VERSION, optionally with
  * a FILE position inside that version's ordered file list — and each
  * micro-batch is exactly the files between two cursors
  * ([[LakehouseTable.readIncremental]] semantics — new files only, never
  * a rescan). The first batch is the full snapshot at the then-current
  * version, then the source tails commits: append N rows → one
  * micro-batch of exactly those N rows. This is Delta's streaming-source
  * design (reservoir version offsets + AddFile tailing +
  * maxFilesPerTrigger admission) expressed over the graft manifest.
  *
  * Restart safety comes from the engine's own offset log: the checkpoint
  * stores the cursor reached; `getBatch` after a restart re-reads exactly
  * the files between the two cursors and nothing else — manifests and
  * data files are immutable, so a replayed range is bit-identical.
  * Non-append transitions (COW delete / merge / overwrite rewrote or
  * dropped files) are REFUSED by default, like Delta without
  * `ignoreChanges`: a file diff would re-emit every surviving row of a
  * rewritten file. Pass `.option("ignoreChanges", "true")` to tail the
  * added files anyway (per-file replay semantics, rewritten rows
  * re-emitted — the documented Delta trade).
  *
  * Admission control composes three caps:
  *   - `maxVersionsPerBatch` — at most n manifest versions per batch;
  *   - `maxFilesPerBatch` — at most n data files per batch, splitting
  *     WITHIN a version (including the initial snapshot) when one commit
  *     carries more files than the cap. An N-file commit arrives as
  *     ⌈N/cap⌉ batches; a backfilled table's first read arrives bounded
  *     instead of as one table-sized batch.
  *   - `maxBytesPerBatch` — a soft byte budget per batch (Delta's
  *     maxBytesPerTrigger): files are admitted in cursor order while
  *     their cumulative size fits; the first file of a batch is always
  *     admitted, so one file larger than the cap arrives alone instead
  *     of stalling the stream. A commit with one large + many small
  *     files arrives split by SIZE, which the file-count cap alone
  *     cannot bound.
  *
  * Scale shape: `getOffset` is a manifest-dir listing plus one small
  * manifest read per admitted version; `getBatch` is a scan of ONLY the
  * cursor-range files. Nothing is proportional to table size except the
  * (cap-bounded) initial snapshot.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft-table")            // or the provider's class name
  *     .option("path", tableRoot)
  *     .load()
  * }}}
  */
class GraftTableSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  /** Streaming SINK into a graft table — the other half of the format:
    * `df.writeStream.format("graft-table").option("path", root)`.
    * Append-only; each micro-batch commits with its batchId as the
    * manifest transaction under a per-checkpoint writer id (Delta's
    * (txnAppId, txnVersion) pattern), so a batch replayed after a crash
    * between manifest commit and checkpoint commit is SKIPPED — the
    * end-to-end guarantee is effectively-once, same as
    * [[Streams.ingestInto]]'s foreachBatch form but as a first-class
    * sink. Override the writer id with `.option("txnApp", ...)` when two
    * queries share one checkpoint lineage. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-table sink supports Append output mode only, got $outputMode " +
        "(aggregate first, or land updates through foreachBatch + merge)")
    require(parameters.contains("txnApp") ||
        parameters.contains("checkpointLocation"),
      "graft-table sink needs a writer identity for its replay guard: " +
        "set .option(\"checkpointLocation\", ...) on THIS writer (a " +
        "session-conf checkpoint is invisible here) or pass " +
        ".option(\"txnApp\", ...) — a table-derived default would make " +
        "two queries writing one table skip each other's batches")
    val app = parameters.get("txnApp").getOrElse("ckpt-" +
      graft.plans.TextExpressions.md5Hex(parameters("checkpointLocation"))
        .take(16))
    new GraftTableSink(rootOf(parameters), partitionColumns, app)
  }

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-table source requires .option(\"path\", <table root>)"))

  private def positiveInt(parameters: Map[String, String],
      name: String): Option[Int] =
    parameters.get(name).map { v =>
      val n = v.toInt
      require(n >= 1, s"$name must be >= 1, got $n")
      n
    }

  private def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val base =
        LakehouseTable.read(sqlContext.sparkSession, rootOf(parameters)).schema
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
    // Delta-source start options: skip the initial snapshot and tail
    // changes from a version (exclusive base — the first batch is the
    // files ADDED after it) or from the first commit at/after a
    // timestamp. Mutually exclusive, consulted only on a FRESH stream
    // (a checkpointed query resumes from its own offsets).
    // internal form: the EXCLUSIVE base version (Delta's startingVersion
    // is inclusive — its own changes are the first batch); "latest"
    // tails only future commits
    val startingVersion = parameters.get("startingVersion").map {
      case s if s.equalsIgnoreCase("latest") =>
        LakehouseTable.currentVersion(root).getOrElse(-1L)
      case s => s.toLong - 1
    }
    val startingTs = parameters.get("startingTimestamp").map { t =>
      // parse under the SESSION timezone (Delta's semantics), not the
      // JVM default — a host-offset shift would move the start point by
      // hours
      val tz = java.time.ZoneId.of(
        sqlContext.sparkSession.sessionState.conf.sessionLocalTimeZone)
      val norm = t.trim.replace(' ', 'T')
      val ldt =
        try {
          if (norm.contains('T')) java.time.LocalDateTime.parse(norm)
          else java.time.LocalDate.parse(norm).atStartOfDay()
        } catch {
          case _: java.time.format.DateTimeParseException =>
            // lenient single-digit fields ("2024-1-1 3:00:00"):
            // Timestamp.valueOf parses FIELDS with no timezone attached,
            // so routing them through toLocalDateTime keeps the
            // session-timezone semantics
            java.sql.Timestamp.valueOf(t.trim.replace('T', ' ')).toLocalDateTime
        }
      val ms = ldt.atZone(tz).toInstant.toEpochMilli
      val vs = LakehouseTable.versions(root)
      // base = the version BEFORE the first commit at/after ts, so that
      // commit's rows are the first batch
      vs.zipWithIndex.find { case (v, _) =>
        LakehouseTable.commitTsAt(root, v).getOrElse(Long.MinValue) >= ms
      } match {
        case Some((_, 0)) => -1L // everything qualifies: tail from before v0
        case Some((_, i)) => vs(i - 1)
        case None => vs.lastOption.getOrElse(-1L) // nothing yet: only future commits
      }
    }
    require(startingVersion.isEmpty || startingTs.isEmpty,
      "graft-table source: startingVersion and startingTimestamp are mutually exclusive")
    // NATIVE streaming CDF (readChangeFeed=true): row-level changes with
    // the Delta CDF column shape, straight off the graft table — no
    // Delta-mirror detour. Keys come from the table's own CDF
    // configuration (enableChangeDataFeed), overridable per query with
    // .option("keys", "a,b") for tables streamed before CDF was enabled.
    val cdf = cdfOf(parameters)
    val cdfKeys: Seq[String] =
      if (!cdf) Nil
      else parameters.get("keys")
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse {
          val cur = LakehouseTable.currentVersion(root).getOrElse(
            throw new IllegalArgumentException(s"no table at $root"))
          LakehouseTable.cdfKeysAt(root, cur)
        }
    if (cdf) require(cdfKeys.nonEmpty,
      s"graft-table source readChangeFeed over $root needs row keys: " +
        "enable the table's change feed (enableChangeDataFeed) or pass " +
        ".option(\"keys\", \"k1,k2\")")
    new GraftTableSource(sqlContext.sparkSession, root,
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean),
      maxVersionsPerBatch = positiveInt(parameters, "maxVersionsPerBatch"),
      maxFilesPerBatch = positiveInt(parameters, "maxFilesPerBatch"),
      maxBytesPerBatch = parameters.get("maxBytesPerBatch").map { v =>
        val n = v.toLong
        require(n >= 1, s"maxBytesPerBatch must be >= 1, got $n")
        n
      },
      metadataPath = Some(metadataPath),
      startingVersion = startingVersion.orElse(startingTs),
      readChangeFeed = cdf,
      cdfKeys = cdfKeys)
  }
}

/** DSv1 streaming sink over a graft lakehouse table (see
  * [[GraftTableSourceProvider.createSink]] for the contract). The
  * micro-batch DataFrame is rebased onto its already-planned RDD
  * ([[GraftStreamingShims.batchDataFrame]]) before the table write, the
  * Delta-DSv1-sink pattern. */
class GraftTableSink(root: String, partitionBy: Seq[String], txnApp: String)
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (LakehouseTable.lastTxn(root, txnApp).exists(_ >= batchId)) return
    val batch = GraftStreamingShims.batchDataFrame(data.sparkSession, data)
    if (LakehouseTable.versions(root).isEmpty)
      LakehouseTable.create(batch, root, partitionBy,
        txn = Some(batchId), txnApp = txnApp)
    else
      LakehouseTable.append(batch, root, partitionBy,
        txn = Some(batchId), txnApp = txnApp)
  }
  override def toString: String = s"GraftTableSink[$root]"
}

/** Cursor offset for [[GraftTableSource]]: `json` is the bare version
  * number for a whole-version position (round-trips with old checkpoints
  * via `.toLong`), or `v:k[:snap]` for a FILE cursor — the first k files
  * of version v's ordered file list have been emitted, the list being
  * the full sorted manifest when the `:snap` marker is present (a split
  * initial snapshot) and the sorted manifest-diff against the previous
  * version otherwise. */
case class GraftVersionOffset(v: Long, filePos: Option[Long] = None,
    snapshot: Boolean = false) extends Offset {
  override def json: String = filePos match {
    case Some(k) => s"$v:$k" + (if (snapshot) ":snap" else "")
    case None    => v.toString
  }
}

object GraftVersionOffset {
  def parse(json: String): GraftVersionOffset = json.trim.split(':') match {
    case Array(v)            => GraftVersionOffset(v.toLong)
    case Array(v, k)         => GraftVersionOffset(v.toLong, Some(k.toLong))
    case Array(v, k, "snap") =>
      GraftVersionOffset(v.toLong, Some(k.toLong), snapshot = true)
    case _ =>
      throw new IllegalArgumentException(s"bad graft-table offset: '$json'")
  }
}

class GraftTableSource(spark: SparkSession, root: String,
    override val schema: StructType, ignoreChanges: Boolean,
    maxVersionsPerBatch: Option[Int] = None,
    maxFilesPerBatch: Option[Int] = None,
    maxBytesPerBatch: Option[Long] = None,
    metadataPath: Option[String] = None,
    startingVersion: Option[Long] = None,
    readChangeFeed: Boolean = false,
    cdfKeys: Seq[String] = Nil) extends Source {

  private def cursorOf(o: Offset): GraftVersionOffset = o match {
    case g: GraftVersionOffset => g
    case other                 => GraftVersionOffset.parse(other.json)
  }

  /** The ordered file list a cursor at version `v` indexes into: the full
    * manifest for a snapshot cursor, the manifest-diff against version
    * v−1 otherwise (graft versions are contiguous, so v−1 IS the commit
    * base). Sorted — manifests are immutable, so positions are
    * deterministic across restarts. The base manifest being vacuumed
    * away is a LOUD failure, not a silent re-diff against an older
    * retained version: that would shift both membership and sort
    * positions under a persisted cursor and replay the wrong files. */
  private def fileListOf(v: Long, snapshot: Boolean): Seq[String] = {
    if (v < 0) return Nil // synthetic pre-v0 base (startingVersion 0)
    val cur = LakehouseTable.manifestFiles(root, v)
    if (snapshot || v == 0) cur.sorted
    else if (LakehouseTable.versions(root).contains(v - 1)) {
      val before = LakehouseTable.manifestFiles(root, v - 1).toSet
      cur.filterNot(before).sorted
    } else
      throw new IllegalStateException(
        s"graft-table stream over $root: version ${v - 1} (the diff base " +
          s"of the cursor at $v) was removed by VACUUM; file positions " +
          "cannot be reconstructed. Restart the query from scratch.")
  }

  /** The admission-cap anchor lives under the source's metadataPath,
    * which the engine hands over as a URI STRING (`file:/...`,
    * `hdfs://...`): resolve it through the Hadoop FileSystem API — the
    * HDFSMetadataLog pattern — so the anchor lands inside the checkpoint
    * on any scheme, never at a cwd-relative `file:` literal path. */
  private def anchorFs: Option[(FileSystem, HPath)] =
    metadataPath.map { m =>
      val p = new HPath(m, "graft-last-planned")
      (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
    }

  /** Cursor of the last batch this source PLANNED — the anchor the
    * admission caps count from. Persisted under the source's
    * metadataPath so the caps survive a restart: without that, the first
    * post-restart batch of a long backlog would be one giant catch-up
    * batch (the DSv1 wrinkle Delta's maxFilesPerTrigger has — getOffset
    * runs before any getBatch reveals the checkpointed position).
    * Lost/absent state degrades to exactly that documented behavior,
    * never to wrong data: the anchor is admission control only. */
  @volatile private var lastPlanned: Option[GraftVersionOffset] =
    readAnchor()
      // a declared start position (startingVersion/startingTimestamp)
      // seeds the cursor of a FRESH stream at its exclusive base: no
      // initial snapshot, the first batch is the base's successor diff.
      // A persisted anchor (restart) always wins over the declaration.
      .orElse(startingVersion.map(GraftVersionOffset(_)))

  /** True when this stream has COMMITTED offsets (a restart): the
    * checkpoint's offsets log is consulted, not the anchor — metadataPath
    * is `<checkpoint>/sources/<i>`, so the log lives two levels up. */
  private def hasCommittedOffsets: Boolean =
    metadataPath.forall { m =>
      try {
        val off = new HPath(new HPath(m).getParent.getParent, "offsets")
        val fs = off.getFileSystem(spark.sessionState.newHadoopConf())
        fs.exists(off) && fs.listStatus(off).nonEmpty
      } catch {
        // the flaky-FS window that loses the anchor can also fail this
        // listing — assume RESTARTED (degrade to one uncapped catch-up
        // batch) rather than fresh (a snapshot-flagged offset against a
        // committed incremental cursor re-emits delivered rows)
        case _: Throwable => true
      }
    }

  private def readAnchor(): Option[GraftVersionOffset] =
    anchorFs.flatMap { case (fs, p) =>
      scala.util.Try {
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          try {
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](256)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
            Some(GraftVersionOffset.parse(out.toString("UTF-8")))
          } finally in.close()
        }
      }.toOption.flatten
    }

  private def persistAnchor(c: GraftVersionOffset): Unit =
    anchorFs.foreach { case (fs, p) =>
      try {
        val tmp = new HPath(p.getParent, p.getName + ".tmp")
        val out = fs.create(tmp, true)
        try out.write(c.json.getBytes("UTF-8")) finally out.close()
        fs.delete(p, false)
        if (!fs.rename(tmp, p)) { fs.delete(tmp, false); fs.delete(p, false) }
      } catch {
        case _: Throwable =>
          // A STALE anchor is the one dangerous state: an anchor behind
          // the engine's committed offset caps getOffset below the
          // stream's position and stalls it permanently. If we cannot
          // advance the file, remove it — a restart then degrades to one
          // uncapped catch-up batch (the documented no-anchor behavior),
          // never to a stall. Admission state only; never fail a batch.
          try fs.delete(p, false) catch { case _: Throwable => () }
      }
    }

  /** Byte/file-budget state for one admission walk. Byte sizes are only
    * STATTED when the byte cap is set (one size lookup per admitted
    * file, the AddFile.size lookup Delta's maxBytesPerTrigger does); the
    * first file of a batch is always admitted even when it alone
    * overshoots the byte budget — the soft-max contract that keeps a
    * stream moving past a file larger than the cap. */
  private final class Budget {
    var files: Long = maxFilesPerBatch.map(_.toLong).getOrElse(Long.MaxValue)
    var bytes: Long = maxBytesPerBatch.getOrElse(Long.MaxValue)
    var any: Boolean = false
    /** Admit `list(pos...)`; returns the new position (== list length
      * when the whole list was admitted with budget to spare). */
    def admit(list: Seq[String], from: Long): Long = {
      var pos = from
      while (pos < list.length) {
        if (files <= 0) return pos
        val sz = if (maxBytesPerBatch.isEmpty) 0L
                 else LakehouseTable.dataFileSize(root, list(pos.toInt))
        if (any && sz > bytes) return pos
        any = true; files -= 1; bytes = math.max(0L, bytes - sz); pos += 1
      }
      pos
    }
    def spent: Boolean = files <= 0 || (any && bytes <= 0)
  }

  /** Latest admitted cursor — the engine plans a batch whenever this
    * advances past the last processed offset. With the caps set, a long
    * backlog (a backfill, a restarted stream behind a busy table, one
    * giant commit) is admitted `maxVersionsPerBatch` versions /
    * `maxFilesPerBatch` files / `maxBytesPerBatch` bytes at a time
    * instead of as one unbounded catch-up batch — bounded batch size,
    * bounded per-batch file lists, steady checkpoint progress. */
  override def getOffset: Option[Offset] =
    LakehouseTable.currentVersion(root).map { cur =>
      val capped = maxFilesPerBatch.nonEmpty || maxBytesPerBatch.nonEmpty
      lastPlanned match {
        case None =>
          // Snapshot-split planning is only sound for a GENUINELY fresh
          // stream: after a restart that lost the anchor, the committed
          // position is an incremental cursor, and a snapshot-flagged
          // offset would make later batches slice the full-manifest list
          // and re-emit delivered rows. The checkpoint's offsets log —
          // the source of truth the anchor merely caches — tells the two
          // apart; a restarted-anchorless stream degrades to the
          // documented single uncapped catch-up batch.
          if (capped && !hasCommittedOffsets) {
            val list = fileListOf(cur, snapshot = true)
            val b = new Budget
            val k = b.admit(list, 0L)
            if (k >= list.length) GraftVersionOffset(cur)
            else GraftVersionOffset(cur, Some(k), snapshot = true)
          } else GraftVersionOffset(cur)
        case Some(c) =>
          val capV = maxVersionsPerBatch
            .map(mx => math.min(cur, c.v + mx)).getOrElse(cur)
          if (!capped) {
            // version cap only: whole-version offsets, as before. A
            // partial cursor (file cap removed across a restart)
            // completes its version via the bare-version offset.
            if (capV <= c.v && c.filePos.isEmpty) c
            else GraftVersionOffset(math.max(capV, c.v))
          } else {
            // file/byte cursor walk: remainder of the cursor's version,
            // then later versions' diffs, until a budget is spent.
            // Empty diffs (metadata-only commits) cost nothing and are
            // stepped over.
            var v = c.v
            var snap = c.snapshot
            // a whole-version cursor (no filePos) is fully consumed:
            // do NOT materialize its file list — fileListOf needs the
            // v−1 manifest for the diff, and after a VACUUM that
            // dropped it (caught-up stream, retainLast=1) the listing
            // would throw forever even though no file of v is needed
            var list: Seq[String] =
              if (c.filePos.isEmpty) Nil else fileListOf(v, snap)
            var listLen = list.length.toLong
            var pos = c.filePos.getOrElse(listLen)
            val b = new Budget
            pos = b.admit(list, pos)
            val later = LakehouseTable.versions(root)
              .filter(w => w > c.v && w <= capV)
            var idx = 0
            var blocked = false
            while (idx < later.length && !b.spent && !blocked &&
                pos >= listLen) {
              val w = later(idx)
              val wList = fileListOf(w, snapshot = false)
              val wPos = b.admit(wList, 0L)
              // the next version's FIRST file does not fit the remaining
              // byte budget: stay at the current cursor position — an
              // offset at (w, 0) would add no files but still read as
              // new, planning a spurious empty batch every trigger
              if (wPos == 0 && wList.nonEmpty && b.any) blocked = true
              else {
                // CDF batches are VERSION-ATOMIC: change rows are not
                // file-addressable (a COW delete's row-level diff spans
                // the whole rewrite), so a version the budget cannot
                // finish is still admitted whole and the budget marked
                // spent — the caps bound where a CDF batch ENDS at
                // version granularity, exactly like maxVersionsPerBatch
                val admitted =
                  if (readChangeFeed && wPos < wList.length) {
                    b.files = 0
                    wList.length.toLong
                  } else wPos
                v = w; snap = false
                list = wList; listLen = wList.length.toLong; pos = admitted
                idx += 1
              }
            }
            // no progress (cursor already at the frontier): re-emit the
            // cursor VERBATIM — a re-encoded-but-equal position would
            // read as a new offset and trigger an empty batch
            if (v == c.v && snap == c.snapshot &&
                pos == c.filePos.getOrElse(listLen)) c
            // CDF tail cursors that COMPLETE a version encode as the bare
            // version: a (v, len) cursor would need the v−1 manifest on
            // the next walk just to learn it is complete, which throws
            // forever once a caught-up stream's base is vacuumed
            else if (readChangeFeed && !snap && pos >= listLen)
              GraftVersionOffset(v)
            else GraftVersionOffset(v, Some(pos), snap)
          }
      }
    }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endC = cursorOf(end)
    lastPlanned = Some(endC)
    persistAnchor(endC)
    def emptyBatch: DataFrame =
      LakehouseTable.read(spark, root, Some(endC.v)).limit(0)
    def readSlice(files: Seq[String]): DataFrame =
      if (files.isEmpty) emptyBatch
      else LakehouseTable.readFilesLogicalAt(spark, root, endC.v, files)
    // CHANGE-FEED MODE (readChangeFeed=true): the initial batch is the
    // snapshot's rows as `insert` changes stamped at its version (the
    // same Delta initial-snapshot rule the delta-export source applies);
    // every later batch is the PER-VERSION row-level diff via
    // LakehouseTable.changeFeed, stamped with each commit's version and
    // timestamp. Rewrites/deletes never refuse here — CDF records
    // row-level truth, which is the point of tailing changes instead of
    // files. Batches are version-atomic past the snapshot (see
    // getOffset); a replayed range recomputes the same diffs from the
    // same immutable manifests.
    def cdfStamp(df: DataFrame, v: Long, insertAll: Boolean): DataFrame = {
      val ts = LakehouseTable.commitTsAt(root, v)
      val withType =
        if (insertAll) df.withColumn("_change_type", lit("insert")) else df
      withType.withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp",
          ts.map(t => lit(new java.sql.Timestamp(t)))
            .getOrElse(lit(null)).cast("timestamp"))
    }
    def cdfLegOf(w: Long): DataFrame =
      // v0 has no predecessor manifest: its "changes" are its rows as
      // inserts (a startingVersion 0 / pre-v0 timestamp start)
      if (w == 0L)
        cdfStamp(LakehouseTable.read(spark, root, Some(0L)), 0L,
          insertAll = true)
      else
        cdfStamp(LakehouseTable.changeFeed(spark, root, w - 1, w, cdfKeys),
          w, insertAll = false)
    def cdfBatch: DataFrame = (start, startingVersion) match {
      case (None, None) => endC.filePos match {
        case None =>
          cdfStamp(LakehouseTable.read(spark, root, Some(endC.v)), endC.v,
            insertAll = true)
        case Some(k) =>
          cdfStamp(readSlice(fileListOf(endC.v, snapshot = true).take(k.toInt)),
            endC.v, insertAll = true)
      }
      case (s0, sv) =>
        val c = s0.map(cursorOf).getOrElse(GraftVersionOffset(sv.get))
        if (endC.v < c.v ||
            (endC.v == c.v && endC.filePos == c.filePos)) emptyBatch
        else {
          var parts = Vector.empty[DataFrame]
          // remainder of a split initial snapshot: still inserts at c.v
          if (c.snapshot && c.filePos.isDefined) {
            val listC = fileListOf(c.v, snapshot = true)
            val from = c.filePos.get.toInt
            val to =
              if (endC.v == c.v) endC.filePos.map(_.toInt).getOrElse(listC.length)
              else listC.length
            if (to > from)
              parts :+= cdfStamp(readSlice(listC.slice(from, to)), c.v,
                insertAll = true)
          }
          LakehouseTable.versions(root)
            .filter(w => w > c.v && w <= endC.v)
            .foreach(w => parts :+= cdfLegOf(w))
          if (parts.isEmpty) emptyBatch
          else parts.reduce(_.unionByName(_, allowMissingColumns = true))
        }
    }
    val batch = if (readChangeFeed) cdfBatch
    else (start, startingVersion) match {
      // first batch(es) of a fresh query with NO declared start: the
      // snapshot at endC.v (Delta's initial reservoir read), whole or a
      // file-cap prefix of it
      case (None, None) => endC.filePos match {
        case None    => LakehouseTable.read(spark, root, Some(endC.v))
        case Some(k) =>
          readSlice(fileListOf(endC.v, snapshot = true).take(k.toInt))
      }
      case (s0, sv) =>
        // a declared start makes the first batch a tail diff from the
        // exclusive base, exactly like a resumed cursor
        val c = s0.map(cursorOf).getOrElse(GraftVersionOffset(sv.get))
        if (endC.v < c.v ||
            (endC.v == c.v && endC.filePos == c.filePos)) emptyBatch
        else {
          if (endC.v > c.v && c.v >= 0) {
            if (!ignoreChanges &&
                LakehouseTable.removedFilesBetween(root, c.v, endC.v).nonEmpty)
              throw new IllegalStateException(
                s"graft-table stream over $root: versions (${c.v}, ${endC.v}] " +
                  "rewrote or dropped data files (delete/merge/overwrite/" +
                  "compact); a file-diff batch would re-emit surviving rows. " +
                  "Restart from scratch or set ignoreChanges=true to accept " +
                  "per-file replay semantics.")
            // a MERGE-ON-READ delete changes no files — it changes a
            // carried file's deletion-vector entry, retroactively deleting
            // rows this stream already emitted. A file-diff batch cannot
            // represent that; refuse like the rewrite case (Delta without
            // ignoreDeletes has the same contract).
            if (!ignoreChanges &&
                LakehouseTable.dvsAt(root, endC.v) !=
                  LakehouseTable.dvsAt(root, c.v))
              throw new IllegalStateException(
                s"graft-table stream over $root: versions (${c.v}, ${endC.v}] " +
                  "changed deletion vectors (MOR delete); already-emitted " +
                  "rows were retroactively deleted. Restart from scratch or " +
                  "set ignoreChanges=true to skip the deletions.")
          }
          val files = scala.collection.mutable.ArrayBuffer[String]()
          if (endC.v == c.v) {
            // same version, file position advanced: a slice of one list
            val list = fileListOf(c.v, c.snapshot)
            val from = c.filePos.getOrElse(list.length.toLong).toInt
            val to = endC.filePos.map(_.toInt).getOrElse(list.length)
            files ++= list.slice(from, to)
          } else {
            c.filePos.foreach { k =>
              files ++= fileListOf(c.v, c.snapshot).drop(k.toInt)
            }
            LakehouseTable.versions(root)
              .filter(w => w > c.v && w < endC.v)
              .foreach(w => files ++= fileListOf(w, snapshot = false))
            val listE = fileListOf(endC.v, endC.snapshot)
            files ++= endC.filePos.map(k => listE.take(k.toInt)).getOrElse(listE)
          }
          // net semantics: a file added then removed again WITHIN this
          // planned range (possible only under ignoreChanges) is not
          // read — same contract as a manifest-diff readIncremental.
          // The filter is against the immutable end manifest, so a
          // checkpoint replay of this exact range reproduces it.
          val alive = LakehouseTable.manifestFiles(root, endC.v).toSet
          readSlice(files.toSeq.filter(alive))
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
    val droppedNow = LakehouseTable.droppedColumnsAt(root, endC.v)
      .map(_.toLowerCase).toSet
    val renamedAway = LakehouseTable.renamedColumnsAt(root, endC.v)
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
