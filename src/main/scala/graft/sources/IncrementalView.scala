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
        val delta = aggregate(
          LakehouseTable.readIncremental(spark, srcRoot, doneV, Some(srcV)),
          key, valueCol)
        val cur = LakehouseTable.read(spark, aggRoot)
          .select(col(key).as("k_old"), col("n").as("n_old"),
            col("sum_value").as("s_old"))
        // merge deltas: upsert rows for keys present in the delta.
        // null-SAFE key join (a NULL key folds into its existing row) and
        // null-SKIPPING sum merge (like SQL sum itself: NULL + x = x, and
        // NULL only when no side ever saw a non-null value) — so the
        // result stays bit-identical to a full recompute
        val mergedSum = when(col("sum_value").isNull, col("s_old"))
          .when(col("s_old").isNull, col("sum_value"))
          .otherwise(col("sum_value") + col("s_old"))
        val upserts = delta.join(cur, col(key) <=> col("k_old"), "left")
          .select(col(key),
            (col("n") + coalesce(col("n_old"), lit(0L))).as("n"),
            mergedSum.cast(DSum).as("sum_value"))
        LakehouseTable.merge(spark, aggRoot, upserts, Seq(key), txn = Some(srcV), txnApp = App)
        srcV
    }
  }
}
