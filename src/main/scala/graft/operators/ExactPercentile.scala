package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT interpolated percentiles (bit-identical to Spark's `percentile`,
  * and therefore to DuckDB's `quantile_cont` — the parity the gate relies
  * on) computed with BOUNDED memory.
  *
  * Spark's `percentile` is an ImperativeAggregate that buffers EVERY raw
  * value of a group inside one task — the one OOM-shaped aggregate left on
  * an oracled path after round 3 (round-3 verdict, "What's wrong" #1): at
  * 100 TB a 3-group percentile buffers n/3 doubles per task. This operator
  * recomputes the same order statistics from per-(group, value) COUNTS:
  *
  *  1. one hash aggregation → (group, value, count) — map-side partials,
  *     shuffle is O(distinct pairs), never O(rows);
  *  2. a cumulative-count window sorted by value within each group
  *     (sort-based, spillable — no in-memory group buffer) assigns each
  *     distinct value its 0-based rank interval [cum − c, cum);
  *  3. the two order statistics straddling position p·(n−1) fall out of a
  *     `max(when(interval covers index))` filter, and the final linear
  *     interpolation `(hi − pos)·v_lo + (pos − lo)·v_hi` reproduces
  *     Percentile.getPercentile's double arithmetic EXACTLY (same
  *     promotions, same special case at integral positions).
  *
  * State per task is O(1) beyond the spillable sort; the only full-width
  * shuffle carries the distinct-value counts. This is the production path
  * for q49/q59/q95/q98; the SQL twins keep their `quantile_cont` form.
  */
object ExactPercentile {

  /** One row per group: `groupCols` plus one exact percentile column per
    * `(name, p)` in `ps` (all over `value`, nulls ignored, output double).
    */
  def percentiles(df: DataFrame, groupCols: Seq[String], value: Column,
      ps: Seq[(String, Double)]): DataFrame =
    fromCounts(
      df.filter(value.isNotNull)
        .groupBy(groupCols.map(col) :+ value.cast("double").as("__v"): _*)
        .agg(count(lit(1)).as("__c")),
      groupCols, ps)

  /** The same exact percentiles over an ALREADY-AGGREGATED distinct-value
    * relation (`groupCols`, `__v` double, `__c` count) — `__v` MUST be
    * unique per group and non-null (the cumulative window's RANGE frame
    * merges ties, corrupting the rank intervals). Lets a caller
    * that needs several percentile passes over the same rows (q95's
    * median → MAD → outlier count) derive every later pass from the
    * FIRST pass's O(distinct values) relation instead of re-scanning and
    * re-aggregating the corpus (optimization round 17, guide §2.3/§1.2:
    * don't recompute what a smaller relation already carries). */
  def fromCounts(counts: DataFrame, groupCols: Seq[String],
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
    val g = groupCols.map(col)
    val cw = Window.partitionBy(g: _*).orderBy(col("__v"))
    val tw = Window.partitionBy(g: _*)
    val ranked = counts
      .withColumn("__cum", sum(col("__c")).over(cw))
      .withColumn("__n", sum(col("__c")).over(tw))
    // per percentile: the distinct values whose rank interval covers the
    // straddling indices floor(pos) and ceil(pos); max(when(...)) picks
    // them out as plain hash-aggregable aggregates (≤1 row matches each)
    val aggs = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      def at(r: Column) = max(when(
        col("__cum") - col("__c") <= r && r < col("__cum"), col("__v")))
      Seq(at(floor(pos)).as(s"__lo_$name"), at(ceil(pos)).as(s"__hi_$name"))
    } :+ max(col("__n")).as("__n")
    val picked = ranked.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    val outs = ps.map { case (name, p) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      when(lo === hi, col(s"__lo_$name"))
        .otherwise((hi.cast("double") - pos) * col(s"__lo_$name")
          + (pos - lo.cast("double")) * col(s"__hi_$name"))
        .as(name)
    }
    picked.select(g ++ outs: _*)
  }
}
