package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming forms of the event-time operators (SURVEY.md §2.1
  * ops #17-19: per-session state, session timeout, incremental execution).
  *
  * The batch twins in graft.operators.EventsOps are the oracle-checked
  * semantics; these run the same logic incrementally with watermarks and
  * keyed state. Unit tests drive them with a file source + memory sink and
  * assert agreement with the batch results (the strongest check available
  * without a DuckDB streaming oracle).
  */
object Streams {

  /** File-source stream over a directory of events parquet files. A file
    * stream needs a declared schema, and the physical type of `ts` has
    * varied across testdata generations (int64 nanos vs timestamp[us] —
    * see [[graft.sources.Tables.events]]), so the schema is probed from
    * the files already staged in `dir` when any exist. A
    * start-before-first-file deployment (empty or absent staging dir) gets
    * the declared default schema instead of an AnalysisException — the
    * current generator's layout; pass `schema` explicitly if staging an
    * older layout into a fresh dir. `ts` is then normalized exactly like
    * the batch reader, so stream and batch results agree bit-for-bit. */
  def eventsStream(spark: SparkSession, dir: String,
      schema: Option[StructType] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = schema.getOrElse {
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => eventsRawSchema }
    }
    val stream = spark.readStream.schema(s).parquet(dir)
    stream.withColumn("ts", graft.sources.Tables.normalizedTs(stream))
  }

  /** Declared fallback schema for [[eventsStream]]: the current testdata
    * generator's physical layout (timestamp[us] → TIMESTAMP_NTZ under the
    * file source; [[graft.sources.Tables.normalizedTs]] casts it to the
    * session-TZ TimestampType either way). */
  private[graft] val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** In-flight benchmark decontamination of a document stream (the
    * streaming twin of batch q88): keeps docs sharing NO word 3-gram with
    * the static eval set. The eval grams are a bounded static relation, so
    * the check is a STATELESS per-row filter against their broadcast array
    * — no watermark, no state store, exactly how a deploy-time filter
    * rides an ingestion stream. `docs` must have (doc_id, text). */
  def decontaminateStream(docs: DataFrame, benchGrams: Seq[String]): DataFrame =
    docs
      .withColumn("sh", graft.plans.TextExpressions.wordShingles(col("text"), 3))
      // typedlit → ONE array literal node (array(lit...) would add one
      // Catalyst node per gram and blow past codegen limits on a large
      // eval set); the eval set is bounded by construction, but plan size
      // should not scale with it
      .filter(size(array_intersect(col("sh"), typedlit(benchGrams))) === 0)
      .select(col("doc_id"), col("text"))

  /** Deploy-time quality-weighted sampling on a document stream (the
    * streaming twin of batch q132's accept test): keep a doc iff
    * md5-bucket(doc_id) < floor(quality·2^16), so acceptance probability
    * equals the quality score. Pure per-row arithmetic — stateless, no
    * watermark, no state store — and the draw is a pure function of the
    * id, so a backfill batch run and the live stream keep EXACTLY the
    * same rows (asserted against q132's per-lang accept counts). */
  def qualitySampleStream(docs: DataFrame): DataFrame =
    docs.filter(graft.operators.Pipelines.qualityAccept(col("doc_id"), col("text")))
      .select(col("doc_id"), col("lang"))

  /** Contamination HIT stream: (doc_id, shingle) records for every eval
    * 3-gram seen in a streamed doc — a stream-STATIC inner join (static
    * side bounded → append mode, no state store, no watermark). The
    * distinct doc_ids of this stream are exactly batch q88's flagged
    * set. */
  def contaminationHits(docs: DataFrame, benchGrams: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.plans.TextExpressions.wordShingles(col("text"), 3)).as("shingle"))
      .join(benchGrams, "shingle")
      .select(col("doc_id"), col("shingle"))

  /** Streaming anomaly alerts against batch-derived robust thresholds
    * (the deploy shape of q95_mad_outliers): `thresholds` is the tiny
    * static (event_type, med, mad) relation computed offline; each
    * streamed event is flagged STATELESSLY via a stream-static broadcast
    * join — no watermark, no state store, the same per-row cost as a
    * filter. Emits only the alerts. */
  def anomalyAlerts(events: DataFrame, thresholds: DataFrame): DataFrame =
    events
      .join(broadcast(thresholds), "event_type")
      .filter(abs(col("value") - col("med")) > lit(3.0) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"))

  /** Tumbling 1-hour windows with a 10-minute watermark (late data beyond
    * the watermark is dropped; within it, windows re-emit in update mode).
    * Aggregates use the SAME decimal-exact money sum as the oracled batch
    * twin (q38), so a fully-replayed bounded stream is row-identical to
    * the batch result — StreamingSpec asserts that equality, not a
    * proxy. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.moneySum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .select(col("win.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"), col("min_value"), col("max_value"))

  /** Native session windows: 30-minute inactivity gap per user — the
    * streaming twin of EventsOps q40 (and of the reference's 3600s session
    * retention, app/.chainlit/config.toml:9-10). Decimal-exact sum like
    * the batch twin; note Spark's session_window end = LAST EVENT TIME +
    * gap, so `session_end - 30 min` equals q40's max(ts) — StreamingSpec
    * asserts full row equality through that mapping. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Exact.moneySum(col("value")).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup: first event per (user, type) within the
    * watermark horizon — the incremental twin of Dedup q31 and the
    * streaming form of a training-pipeline dedup stage.
    * `dropDuplicatesWithinWatermark` (not `dropDuplicates`): with the
    * event-time column absent from the key subset, plain dropDuplicates
    * would never evict its state — unbounded growth on a 24/7 stream. The
    * WithinWatermark form drops a key's state once the watermark passes
    * the first-seen event time + the 1 h delay, which is the intended
    * contract: duplicates are only ever near their original in event time. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Windowed distinct-user sketch: approx_count_distinct inside a
    * watermarked tumbling window — the streaming cardinality shape whose
    * state per window is one HLL sketch (KB), not the user-id set. Exact
    * streaming distinct would hold every key until the watermark; the
    * sketch bounds state regardless of cardinality — the 100 TB answer,
    * same as q44's batch sketch. Run in UPDATE (or append) output mode:
    * complete mode would retain every window forever and the watermark
    * would never evict — the demo and test drive it in update mode. */
  def distinctUsersHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("win"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(col("win.start").as("hour"), col("approx_users"), col("n_events"))

  /** Writer identity for the (txnAppId, txnVersion) replay check: the hash
    * of the checkpoint path, because the checkpoint IS the scope in which
    * Structured Streaming batch ids are monotone. A query restarted with a
    * NEW checkpoint restarts batch ids at 0 — under a table-global
    * watermark those fresh batches (carrying genuinely new data) would be
    * silently skipped as "replays"; under a per-checkpoint app id they
    * land, and only true same-checkpoint replays are skipped. Two streams
    * writing one table get distinct app ids the same way. */
  private def txnAppOf(checkpoint: String): String =
    "ckpt-" + graft.plans.TextExpressions.md5Hex(checkpoint).take(16)

  /** Idempotent bronze commit, shared by [[ingestInto]] /
    * [[medallionIngest]]. foreachBatch is at-least-once: a batch replayed
    * after a failure between manifest commit and checkpoint commit would
    * re-append the same rows — so each commit records its batchId as the
    * manifest's transaction id under this stream's app id (Delta's
    * (txnAppId, txnVersion) pattern), and a batch whose id is <= that
    * writer's last committed txn is skipped instead of re-applied. The
    * manifest rename keeps each commit atomic; the txn check upgrades the
    * end-to-end guarantee from at-least-once to effectively-once. */
  private def commitBatch(batch: DataFrame, batchId: Long, tableRoot: String,
      app: String): Unit =
    if (graft.sources.LakehouseTable.lastTxn(tableRoot, app).exists(_ >= batchId)) ()
    else if (graft.sources.LakehouseTable.versions(tableRoot).isEmpty) {
      graft.sources.LakehouseTable.create(batch, tableRoot,
        txn = Some(batchId), txnApp = app); ()
    } else {
      graft.sources.LakehouseTable.append(batch, tableRoot,
        txn = Some(batchId), txnApp = app); ()
    }

  /** Streaming ingestion into a versioned lakehouse table, effectively-once
    * per micro-batch (see [[commitBatch]] for the txn contract). The
    * checkpoint is REQUIRED: with a throwaway checkpoint a restarted query
    * re-lists all files into batch 0, and the txn replay-skip would then
    * silently drop the genuinely-new rows that landed in it. */
  def ingestInto(events: DataFrame, tableRoot: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        commitBatch(batch, batchId, tableRoot, txnAppOf(checkpoint))
      }
      .start()

  /** Streaming ingestion into a FOREIGN Delta table (a `_delta_log`
    * this engine does not own), exactly-once per micro-batch: each
    * commit carries the batch id as a `setTransaction` action under
    * this stream's app id — Delta's own idempotent-writer protocol —
    * so a batch replayed after a failure between log commit and
    * checkpoint commit is detected inside
    * [[graft.sources.LakehouseTable.appendDeltaForeign]] and skipped,
    * and the watermark survives checkpoint + log cleanup (the
    * checkpoint parquet carries `txn` rows). The foreign twin of
    * [[ingestInto]]'s contract. */
  def ingestIntoDeltaForeign(events: DataFrame, tableRoot: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.LakehouseTable.appendDeltaForeign(
          batch.sparkSession, tableRoot, batch.toDF(),
          txn = Some(batchId), txnApp = txnAppOf(checkpoint))
        ()
      }
      .start()

  /** Streaming VECTOR ingestion into the IVF cell index: each
    * micro-batch of (vec_id, embedding) rows is routed to its nearest
    * frozen centroid's `cid=` partition via
    * [[graft.operators.Similarity.appendToCellIndex]] — the index stays
    * probe-correct (cells are a pure per-vector function of the frozen
    * centroids, so a streamed append lands cell-identical to a rebuild)
    * and effectively-once (the commit carries the batch id under this
    * stream's app id; replayed batches skip — the [[commitBatch]]
    * contract applied to index maintenance). The at-scale shape: a
    * centroid broadcast + one map-side argmin per batch, one
    * hive-partitioned commit; no index rebuild anywhere on the hot
    * path. */
  def ingestVectorsInto(vectors: DataFrame, sfDir: String, indexRoot: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val app = txnAppOf(checkpoint)
        if (graft.sources.LakehouseTable.lastTxn(indexRoot, app).exists(_ >= batchId)) ()
        else {
          graft.operators.Similarity.appendToCellIndex(
            batch.sparkSession, sfDir, indexRoot, batch.toDF(),
            txn = Some(batchId), txnApp = app); ()
        }
      }
      .start()

  /** [[ingestInto]] with DLT-style write expectations on the stream: each
    * micro-batch's passing rows append to the table and violating rows
    * land in `<tableRoot>/_rejects` stamped with the violated expectation
    * names — the streaming form of the CHECK-constraint quarantine.
    * Effectively-once on BOTH sides: the main append is txn-stamped with
    * the batch id (replayed batches skip), and the quarantine commit is
    * keyed to the main-table version it accompanies (see
    * [[graft.sources.LakehouseTable.appendWithExpectations]]), so a crash
    * between the two commits re-runs without double-quarantining. */
  def ingestIntoWithExpectations(events: DataFrame, tableRoot: String,
      expectations: Map[String, org.apache.spark.sql.Column],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val app = txnAppOf(checkpoint)
        if (graft.sources.LakehouseTable.lastTxn(tableRoot, app).exists(_ >= batchId)) ()
        else {
          // schema-only v0 so the expectations path (append-shaped) has a
          // table to append to from the very first batch
          if (graft.sources.LakehouseTable.versions(tableRoot).isEmpty)
            graft.sources.LakehouseTable.create(batch.limit(0), tableRoot)
          graft.sources.LakehouseTable.appendWithExpectations(
            batch, tableRoot, expectations,
            txn = Some(batchId), txnApp = app)
          ()
        }
      }
      .start()

  /** Bronze → silver medallion ingestion: each micro-batch appends to the
    * bronze table (idempotently, like [[ingestInto]]), then the silver
    * per-key rollup advances via [[graft.sources.IncrementalView]] — a
    * manifest-diff delta read + keyed merge, never a full recompute. Both
    * tiers are ordinary versioned tables (time-travelable, vacuumable);
    * the rollup is exactly what a batch recompute of bronze would give
    * after every batch. The checkpoint is REQUIRED for the same reason as
    * [[ingestInto]]'s: batch ids must resume across restarts or the
    * replay-skip drops new data. */
  def medallionIngest(events: DataFrame, bronzeRoot: String, silverRoot: String,
      key: String, valueCol: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        commitBatch(batch, batchId, bronzeRoot, txnAppOf(checkpoint))
        graft.sources.IncrementalView.syncAggregate(
          batch.sparkSession, bronzeRoot, silverRoot, key, valueCol)
        ()
      }
      .start()

  /** Streaming CDC-style upsert: every micro-batch MERGEs into the
    * versioned lakehouse table on `keys` — rows for already-present keys
    * replace them, new keys insert — committing one atomic version per
    * batch (the streaming twin of Delta's foreachBatch MERGE pattern).
    * Idempotent per batch via the same txn check as [[ingestInto]].
    * Each batch must carry at most one row per key: collapse multiple
    * updates upstream (e.g. a watermarked last-per-key aggregation),
    * otherwise all of a key's rows in the batch survive the merge. */
  def upsertInto(updates: DataFrame, tableRoot: String, keys: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val app = txnAppOf(checkpoint)
        if (batch.isEmpty ||
            graft.sources.LakehouseTable.lastTxn(tableRoot, app).exists(_ >= batchId)) ()
        else if (graft.sources.LakehouseTable.versions(tableRoot).isEmpty) {
          graft.sources.LakehouseTable.create(batch, tableRoot,
            txn = Some(batchId), txnApp = app); ()
        } else {
          graft.sources.LakehouseTable.merge(batch.sparkSession, tableRoot, batch, keys,
            txn = Some(batchId), txnApp = app); ()
        }
      }
      .start()

  /** Stream-stream inner join with event-time bounds: attribute each
    * `purchase` to every prior `click` by the same user within 30 minutes.
    * Both sides are watermarked AND the join condition bounds purchase_ts
    * relative to click_ts, so buffered join state is droppable: a click is
    * evicted once the watermark passes click_ts + 30 min. Without the time
    * bound the state would grow without limit — this is the canonical
    * bounded-state stream-stream join shape. */
  def clickPurchaseJoin(events: DataFrame, joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    // joinType "leftOuter": an unmatched click emits its null-padded row
    // only once the watermark passes its join horizon (click_ts + 30 min
    // + the delay) — the engine must KNOW no matching purchase can still
    // arrive before it may say "no match". The test advances the
    // watermark with a sentinel event to flush the tail.
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
      joinType)
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  // --- Custom keyed state: per-session history replay, streaming form ----

  case class Evt(event_id: Long, user_id: Long, event_type: String, tsMicros: Long)
  case class HistOut(user_id: Long, event_id: Long, event_type: String, history: String)
  case class HistState(events: List[(Long, Long, String)]) // (tsMicros, event_id, type)

  case class EwmaEvt(event_id: Long, user_id: Long, tsMicros: Long, value: Double)
  case class EwmaOut(user_id: Long, event_id: Long, value: Double, ewma: Double)
  case class EwmaState(events: List[(Long, Long, Double)]) // (tsMicros, event_id, value)

  /** Streaming twin of the batch q126 EWMA: per-user 32-tap α=1/2
    * smoothing with the SAME power-of-two integer arithmetic, so a
    * bounded replay is bit-identical to the batch window form (asserted
    * in StreamingSpec). Each emitted row's frame is the ≤31 event-time
    * predecessors plus itself — a late arrival gets the frame its batch
    * twin computes (rows already emitted stay final; append mode cannot
    * retract — the historyReplay caveat). State is the per-user value
    * log; on a 24/7 stream prune it to the watermark horizon minus 31
    * rows (the replay test is bounded, so it keeps the log whole). */
  def ewmaStream(events: Dataset[EwmaEvt]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[EwmaEvt], state: GroupState[EwmaState]) => {
          var log = state.getOption.map(_.events).getOrElse(Nil)
          val out = batch.toSeq.sortBy(e => (e.tsMicros, e.event_id)).map { e =>
            val frame = (log.filter(p => p._1 < e.tsMicros
                || (p._1 == e.tsMicros && p._2 < e.event_id))
              .sortBy(p => (p._1, p._2)).map(_._3).takeRight(31)
              :+ e.value)
            val num = frame.zipWithIndex
              .map { case (v, i) => math.floor(v * 4096).toLong << i }.sum
            val den = (1L << frame.size) - 1
            log = (e.tsMicros, e.event_id, e.value) :: log
            EwmaOut(userId, e.event_id, e.value, num.toDouble / den.toDouble / 4096.0)
          }
          state.update(EwmaState(log))
          out.iterator
        })
  }

  /** flatMapGroupsWithState twin of Rag q24_history_replay: every event is
    * emitted with the ordered concatenation of all earlier event types of
    * the same user (the RunnableWithMessageHistory accumulation,
    * app/app.py:85-92). State is the per-user message log.
    *
    * `withTimeout=true` evicts idle users after 1 h of processing time,
    * mirroring the reference's session_timeout (config.toml:9-10). Note the
    * engine then schedules timeout-only micro-batches for as long as state
    * exists — correct for a 24/7 stream, but a bounded replay test must use
    * `withTimeout=false` or processAllAvailable crawls through empty
    * checkpoint-grinding batches. */
  def historyReplay(events: Dataset[Evt], withTimeout: Boolean = true): Dataset[HistOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (userId: Long, batch: Iterator[Evt], state: GroupState[HistState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.map(_.events).getOrElse(Nil)
            val incoming = batch.toSeq.sortBy(e => (e.tsMicros, e.event_id))
            var log = prior
            val out = incoming.map { e =>
              // EVENT-time history: only events ordered before this one, in
              // (ts, event_id) order — so a late arrival gets the same
              // history its batch twin (q24) computes. Rows already emitted
              // for later events are final (append mode cannot retract);
              // the late row itself is correct.
              val hist = log
                .filter(p => p._1 < e.tsMicros
                  || (p._1 == e.tsMicros && p._2 < e.event_id))
                .sortBy(p => (p._1, p._2)).map(_._3).mkString(",")
              log = (e.tsMicros, e.event_id, e.event_type) :: log
              HistOut(userId, e.event_id, e.event_type, hist)
            }
            state.update(HistState(log))
            if (withTimeout) state.setTimeoutDuration("1 hour")
            out.iterator
          }
        })
  }
}
