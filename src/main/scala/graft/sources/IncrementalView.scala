package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over lakehouse tables — the
  * batch CDC pattern (the reference's poll-refresh loop, generalized): a
  * downstream aggregate table is kept in sync with an upstream table by
  * reading ONLY the parquet files appended since the last sync and merging
  * per-key deltas, never recomputing the full aggregate.
  *
  * Bookkeeping rides the manifest txns map under this view's own writer
  * app id: each sync commits the aggregate with `txn = <upstream version
  * consumed>`, so the next sync resumes from `lastTxn(aggRoot, App)` —
  * and a streaming writer sharing the table can never clobber (or be
  * clobbered by) the view's watermark. Re-running a sync with no new
  * upstream version is a no-op (idempotent, like the streaming
  * replay-skip).
  *
  * The maintained aggregate is (key, n BIGINT, sum_value DECIMAL(18,2)):
  * count and sum are the self-merging aggregates (delta-add), and the sum
  * stays in exact decimal INSIDE the table so incremental merges are
  * bit-identical to a full recompute regardless of how appends were
  * batched.
  *
  * At 100 TB: the delta scan is O(new files) (manifest diff), the merge is
  * a COW upsert touching only files holding changed keys — this is how a
  * nightly "metrics by key" rollup stays cheap on an append-mostly lake.
  */
object IncrementalView {
  /** Writer app id for the view's upstream-version watermark. */
  private val App = "incremental-view"
  private val D2 = "decimal(18,2)"
  // sum(decimal(18,2)) widens to (28,2); pin every sum_value to that type
  // so create and merge commit an identical schema
  private val DSum = "decimal(28,2)"

  private def aggregate(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(D2)).cast(DSum).as("sum_value"))

  /** True when every file of `from`'s manifest survives in `to`'s — and
    * false (triggering the safe full-recompute path) when files were
    * rewritten OR when the old manifest was vacuumed away entirely, which
    * would otherwise wedge the view forever on a NoSuchFileException. */
  private def appendOnlySince(srcRoot: String, from: Long, to: Long): Boolean =
    try LakehouseTable.removedFilesBetween(srcRoot, from, to).isEmpty
    catch { case _: java.nio.file.NoSuchFileException => false }

  /** How a sync advanced the view — returned by [[syncAggregateCdc]] so
    * callers (and the spec) can PROVE the cheap path ran instead of
    * trusting that it did. */
  sealed trait SyncMode
  object SyncMode {
    /** First sync: full build. */ case object Created extends SyncMode
    /** Upstream unchanged. */ case object NoOp extends SyncMode
    /** Append-only delta merged. */ case object AppendDelta extends SyncMode
    /** Net row changes from the change feed applied as signed deltas. */
    case object CdcDelta extends SyncMode
  }

  /** [[syncAggregate]] upgraded with a CHANGE-FEED delta path: when the
    * upstream transition rewrote files (merge / delete / compaction), the
    * view is advanced by the net row changes from
    * [[LakehouseTable.changeFeed]] — insert/update_postimage rows count
    * +1/+value, delete/update_preimage rows −1/−value — instead of the
    * full recompute [[syncAggregate]] falls back to. `rowKeys` identify
    * upstream rows across rewrites (as in merge). Count and decimal sum
    * are closed under signed deltas, so the result stays bit-identical to
    * a full recompute; groups whose count reaches zero are deleted from
    * the view (a recompute would not contain them).
    *
    * At 100 TB this is the difference between a nightly rollup costing
    * O(churned files) and costing O(table) the moment anything besides an
    * append touches the source. */
  def syncAggregateCdc(spark: SparkSession, srcRoot: String, aggRoot: String,
      rowKeys: Seq[String], key: String, valueCol: String): (Long, SyncMode) = {
    val srcV = LakehouseTable.currentVersion(srcRoot).getOrElse(
      throw new IllegalStateException(s"no table at $srcRoot"))
    LakehouseTable.lastTxn(aggRoot, App) match {
      case None =>
        LakehouseTable.create(
          aggregate(LakehouseTable.read(spark, srcRoot, Some(srcV)), key, valueCol),
          aggRoot, txn = Some(srcV), txnApp = App)
        (srcV, SyncMode.Created)
      case Some(doneV) if doneV >= srcV => (srcV, SyncMode.NoOp)
      case Some(doneV) =>
        val appendOnly = appendOnlySince(srcRoot, doneV, srcV)
        val delta =
          if (appendOnly)
            aggregate(LakehouseTable.readIncremental(spark, srcRoot, doneV, Some(srcV)),
              key, valueCol)
          else {
            val feed = LakehouseTable.changeFeed(spark, srcRoot, doneV, srcV, rowKeys)
            val signedVal = when(col("_change_type").isin("insert", "update_postimage"),
              col(valueCol).cast(D2)).otherwise(-col(valueCol).cast(D2))
            val signedOne = when(col("_change_type").isin("insert", "update_postimage"),
              lit(1L)).otherwise(lit(-1L))
            feed.groupBy(col(key))
              .agg(sum(signedOne).as("n"), sum(signedVal).cast(DSum).as("sum_value"))
          }
        mergeDelta(spark, aggRoot, delta, key, srcV)
        // a group erased upstream leaves an n=0 tombstone the recompute
        // would not contain — remove it (the probe scans only the O(keys)
        // view, and the COW delete runs only when a tombstone exists)
        if (!appendOnly &&
            LakehouseTable.read(spark, aggRoot).filter(col("n") === 0).limit(1)
              .count() > 0)
          LakehouseTable.deleteWhere(spark, aggRoot, "n = 0")
        (srcV, if (appendOnly) SyncMode.AppendDelta else SyncMode.CdcDelta)
    }
  }

  /** Merge a (key, n, sum_value) delta into the aggregate table (shared by
    * the append and CDC paths). */
  private def mergeDelta(spark: SparkSession, aggRoot: String, delta: DataFrame,
      key: String, srcV: Long): Long = {
    val cur = LakehouseTable.read(spark, aggRoot)
      .select(col(key).as("k_old"), col("n").as("n_old"),
        col("sum_value").as("s_old"))
    val mergedSum = when(col("sum_value").isNull, col("s_old"))
      .when(col("s_old").isNull, col("sum_value"))
      .otherwise(col("sum_value") + col("s_old"))
    val upserts = delta.join(cur, col(key) <=> col("k_old"), "left")
      .select(col(key),
        (col("n") + coalesce(col("n_old"), lit(0L))).as("n"),
        mergedSum.cast(DSum).as("sum_value"))
    LakehouseTable.merge(spark, aggRoot, upserts, Seq(key), txn = Some(srcV), txnApp = App)
  }

  /** Sync `aggRoot` = SELECT key, count(*), sum(value) FROM srcRoot GROUP BY
    * key. First call creates the aggregate table; later calls merge only the
    * delta since the upstream version recorded at the previous sync.
    * Returns the upstream version now reflected. */
  def syncAggregate(spark: SparkSession, srcRoot: String, aggRoot: String,
      key: String, valueCol: String): Long = {
    val srcV = LakehouseTable.currentVersion(srcRoot).getOrElse(
      throw new IllegalStateException(s"no table at $srcRoot"))
    // pin srcV for ALL reads below: a concurrent upstream append must not
    // leak rows into this sync, or the next delta double-counts them
    def fullAgg() = aggregate(
      LakehouseTable.read(spark, srcRoot, Some(srcV)), key, valueCol)
    LakehouseTable.lastTxn(aggRoot, App) match {
      case None =>
        LakehouseTable.create(fullAgg(), aggRoot, txn = Some(srcV), txnApp = App)
        srcV
      case Some(doneV) if doneV >= srcV => srcV // nothing new — idempotent
      case Some(doneV) if !appendOnlySince(srcRoot, doneV, srcV) =>
        // non-append transition (compact/cluster/delete/merge rewrote
        // files) OR the doneV manifest was vacuumed away: a file-level
        // delta would double-count or crash — recompute
        LakehouseTable.overwrite(fullAgg(), aggRoot, txn = Some(srcV), txnApp = App)
        srcV
      case Some(doneV) =>
        // merge deltas: upsert rows for keys present in the delta (see
        // mergeDelta — null-SAFE key join, null-SKIPPING sum merge, so the
        // result stays bit-identical to a full recompute)
        mergeDelta(spark, aggRoot,
          aggregate(LakehouseTable.readIncremental(spark, srcRoot, doneV, Some(srcV)),
            key, valueCol),
          key, srcV)
        srcV
    }
  }
}
