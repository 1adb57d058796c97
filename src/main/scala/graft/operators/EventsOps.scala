package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Exact
import graft.sources.Tables

/** Event-time operators over the `events` stream table (SURVEY.md §2.1 ops
  * #17-19 batch twins; streaming forms live in graft.streaming).
  *
  * These are the oracle-checkable batch semantics of the streaming ops:
  * tumbling/sliding windows, gap-based sessionization (lag + running flag
  * sum — one shuffle on user_id, no self-join), an as-of join done
  * merge-style (union + ordered last-non-null window, NOT an O(n·m) range
  * join — the shape that survives 100 TB), and a pivot.
  */
object EventsOps {
  private def ts(s: String) = to_timestamp(lit(s))

  /** Events with a per-user `session_id` from the 30-minute-gap rule — the
    * ONE definition of sessionization semantics, shared by q40 (session
    * stats) and q96 (concurrency sweep); [[sqlSessionized]] is its DuckDB
    * twin. One shuffle on user_id; second-truncated gap math on both
    * engines. */
  private def withSessionIds(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** DuckDB twin of [[withSessionIds]]: subquery with
    * (user_id, event_id, ts, value, session_id). */
  private val sqlSessionized =
    """(SELECT user_id, event_id, ts, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       FROM (SELECT *, CASE WHEN prev_ts IS NULL
             OR epoch(date_trunc('second', ts)) - epoch(date_trunc('second', prev_ts)) > 1800
             THEN 1 ELSE 0 END AS new_session
         FROM (SELECT user_id, event_id, ts, value,
             lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events)))"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour windows per event type.
    "q38_tumbling_hourly" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          Exact.moneySum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // Sliding windows: 10-minute length, 5-minute slide (each event lands
    // in exactly 2 windows; Spark's window() explodes them).
    "q39_sliding_windows" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"), Exact.moneySum(col("value")).as("sum_value"))
        .select(col("window.start").as("win_start"), col("n"), col("sum_value"))
        .orderBy(col("win_start"))
    }),

    // Gap-based sessionization (30-min inactivity): lag to flag session
    // starts, running sum of flags to number sessions — one shuffle.
    "q40_sessionize" -> ((s, d) => {
      withSessionIds(Tables.events(s, d))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("duration_secs"),
          Exact.moneySum(col("value")).as("sum_value"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // As-of join: each event picks the latest order (by o_orderdate) of the
    // same customer at-or-before its timestamp. Merge-style: tag + union +
    // ordered last-non-null window — O((n+m) log) per key, no range join.
    "q41_asof_join" -> ((s, d) => {
      // deterministic 1-row-per-(cust,date): keep max orderkey
      val ord = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("t"))
        .agg(max(col("o_orderkey")).as("okey"))
        .select(col("key"), col("t"), col("okey"),
          lit(0).as("is_evt"), lit(null).cast("long").as("event_id"))
      val evt = Tables.events(s, d)
        .select(col("user_id").as("key"), col("ts").as("t"),
          lit(null).cast("long").as("okey"), lit(1).as("is_evt"), col("event_id"))
      val w = Window.partitionBy(col("key")).orderBy(col("t"), col("is_evt"))
        .rowsBetween(Window.unboundedPreceding, 0)
      ord.unionByName(evt)
        .withColumn("last_order", last(col("okey"), ignoreNulls = true).over(w))
        .filter(col("is_evt") === 1)
        .select(col("event_id"), col("key").as("user_id"),
          coalesce(col("last_order"), lit(-1L)).as("last_orderkey"))
        .orderBy(col("event_id"))
    }),

    // Theta/range join: same-user event pairs within a 5-minute window —
    // the equi-key (user_id) bounds each join cell, the range predicate is
    // a post-filter inside the cell; never a full cross product.
    "q55_time_proximity_join" -> ((s, d) => {
      // both join sides are the same relation keyed the same way: derive
      // them from ONE user_id-partitioned base so the self-join's two
      // exchanges collapse into a single reused shuffle (optimization
      // round 17, guide §2.4) — the join then only sorts within cells
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .repartition(col("user_id"))
      val L = e.select(col("user_id"), col("event_id").as("a"),
        col("ts").as("ta"), col("event_type").as("type_a"))
      val R = e.select(col("user_id"), col("event_id").as("b"),
        col("ts").as("tb"), col("event_type").as("type_b"))
      L.join(R, Seq("user_id"))
        .filter(col("a") < col("b")
          && abs(unix_micros(col("tb")) - unix_micros(col("ta"))) <= 300L * 1000000L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("a")).as("n_left"),
          sum(when(col("type_a") === col("type_b"), 1L).otherwise(0L)).as("same_type_pairs"))
        .orderBy(col("user_id"))
    }),

    // Ordered funnel: per user, the first signup, the first click AFTER
    // that signup, the first purchase AFTER that click; count users
    // reaching each step. Three conditional-min aggregates (one shuffle
    // each on user_id, dims join back) — never a per-user sort/collect.
    "q69_funnel" -> ((s, d) => {
      // (tried in round 17: one user_id repartition shared by all three
      // step subtrees — the per-branch event_type filters push below the
      // repartition, splitting the "shared" exchange into three RAW
      // shuffles (62 KB → 719 KB shuffled). The conditional-min form
      // below shuffles only user-level partial aggregates; kept.)
      val e = Tables.events(s, d)
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      s1.select(lit(1).as("step"), lit("signup").as("event_type"))
        .unionByName(s2.select(lit(2).as("step"), lit("click").as("event_type")))
        .unionByName(s3.select(lit(3).as("step"), lit("purchase").as("event_type")))
        .groupBy(col("step"), col("event_type"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("step"))
    }),

    // Unpivot (melt): a wide daily matrix back to long form — the inverse
    // reshape, with zero-count cells dropped to keep it sparse. The pivot
    // value list is DATA-DRIVEN (pivot() without values scans distinct
    // types), so a new event_type flows through both reshape directions —
    // the oracle twin never pivots and would see it immediately.
    "q70_event_unpivot" -> ((s, d) => {
      val wide = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type")
        .agg(count(lit(1)))
      val typeCols = wide.columns.filter(_ != "day")
      wide.na.fill(0L, typeCols)
        .unpivot(Array(col("day")), typeCols.map(col), "event_type", "n")
        .filter(col("n") > 0)
        .orderBy(col("day"), col("event_type"))
    }),

    // MATCH_RECOGNIZE-lite sequence detection: an 'error' event whose NEXT
    // event (same user, event-time order) is a 'purchase' within 10
    // minutes. lead() over the per-user window — pattern detection without
    // a self-join.
    "q80_pattern_match" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("event_type") === "error" && col("next_type") === "purchase"
          && unix_micros(col("next_ts")) - unix_micros(col("ts")) <= 600L * 1000000L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matches"), min(col("ts")).as("first_match_ts"))
        .orderBy(col("user_id"))
    }),

    // First-order Markov transition matrix over event types: bigram counts
    // via lead(), transition probability = count / row-total (one exact
    // integer division — deterministic doubles).
    "q81_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val bigrams = Tables.events(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val tw = Window.partitionBy(col("from_type"))
      bigrams
        .withColumn("prob", col("n").cast("double") / sum(col("n")).over(tw).cast("double"))
        .select(col("from_type"), col("to_type"), col("n"), col("prob"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // PageRank over the event-transition graph (stationary importance of
    // each event type in the q81 Markov chain), as FIXED-POINT INTEGER
    // arithmetic: ranks live in 1e12-scaled longs, every division is
    // integer `div`, so three power iterations are bit-reproducible across
    // engines — no parallel double sums, no decimal rescale divergence.
    // Edge weights are pre-scaled to 1e6 fixed-point (wfp = cnt*1e6/outw ≤
    // 1e6), which bounds every product: r*wfp ≤ 1e12·1e6 = 1e18 < 2^63 no
    // matter how hot an edge's raw count gets — raw r*cnt would overflow a
    // BIGINT at corpus scale. Each iteration is one edges⋈ranks join + one
    // inflow aggregation (the standard distributed PageRank step: shuffle
    // O(edges), state O(nodes)); the oracle unrolls the same three
    // iterations as CTEs. Dangling mass is dropped (every node here has
    // out-edges; documented simplification, identical in the twin).
    "q94_pagerank" -> ((s, d) => {
      val S = 1000000000000L // rank scale: 1.0 == 1e12
      val ev = Tables.events(s, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = ev
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("cnt"))
      val outs = edges.groupBy(col("src")).agg(sum(col("cnt")).as("outw"))
      // both relations feed every iteration of the loop below — cache one
      // copy per (session, dir) via the registry (retired on dir switch)
      // rather than re-cache()-ing per invocation and never unpersisting
      val e = graft.sources.RelationCache.of(s, "events.q94edges", d) {
        edges.join(outs, "src")
          .select(col("src"), col("dst"),
            expr("cnt * CAST(1000000 AS BIGINT) div outw").as("wfp"))
      }
      val nodes = graft.sources.RelationCache.of(s, "events.q94nodes", d) {
        ev.select(col("event_type")).distinct()
      }
      val n = nodes.count()
      val base = (S * 15L / 100L) / n
      var ranks = nodes.select(col("event_type"), lit(S / n).as("r"))
      for (_ <- 1 to 3) {
        val inflow = e.join(ranks, e("src") === ranks("event_type"))
          .select(col("dst"), expr("r * wfp div CAST(1000000 AS BIGINT)").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
        ranks = nodes.join(inflow, nodes("event_type") === inflow("dst"), "left")
          .select(nodes("event_type"),
            (lit(base) + expr("coalesce(inflow, CAST(0 AS BIGINT)) * 85 div 100")).as("r"))
      }
      ranks.select(col("event_type"), col("r").as("rank_fp"))
        .orderBy(col("event_type"))
    }),

    // Cohort retention: users grouped by first-seen day, counted as active
    // at each day offset — two aggregations (cohort assignment, activity),
    // one broadcast-joinable cohort map.
    "q82_cohorts" -> ((s, d) => {
      val e = Tables.events(s, d)
      val cohorts = e.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
      e.select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
        .join(cohorts, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // SCD2-style run collapsing (gaps-and-islands): consecutive events of
    // the same type per user collapse into validity intervals
    // [valid_from, valid_to] — the slowly-changing-dimension build from an
    // event-sourced attribute. Change flag via lag + running sum, one
    // shuffle on user_id.
    "q79_scd2_runs" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") < 30)
        .withColumn("changed", // null-safe: !(a <=> b) == IS DISTINCT FROM
          when(!(lag(col("event_type"), 1).over(w) <=> col("event_type")), 1L)
            .otherwise(0L))
        .withColumn("run_id",
          sum(col("changed")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("run_id"))
        .agg(min(col("event_type")).as("event_type"), // constant within a run
          min(col("ts")).as("valid_from"),
          max(col("ts")).as("valid_to"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("run_id"))
    }),

    // Time-series regularization: a dense hourly timeline per user
    // (sequence-explode between the user's first and last event hour),
    // left-joined with hourly aggregates, gaps forward-filled with the
    // last non-null hour value — resample + ffill. One shuffle for the
    // aggregate, one window for the fill; the timeline explode is
    // O(span-hours), never a cross join against a calendar table.
    "q76_gap_fill" -> ((s, d) => {
      val e = Tables.events(s, d).filter(col("user_id") < 50)
      val hourly = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"), Exact.moneySum(col("value")).as("hour_value"))
      val spans = e.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
      val timeline = spans.select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, 0)
      timeline.join(hourly, Seq("user_id", "hour"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .withColumn("filled_value", last(col("hour_value"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("hour"), col("n"), col("filled_value"))
        .orderBy(col("user_id"), col("hour"))
    }),

    // Pivot: daily counts fanned out to one column per event type.
    // Robust outlier detection per event type: median + MAD (median
    // absolute deviation), flagging |value − med| > 3·MAD. Three passes by
    // construction (MAD needs the median first, the flag count needs MAD)
    // — each a partial-aggregated groupBy on the same key; the tiny
    // per-type stats broadcast back, so no corpus-sized shuffle repeats.
    // Everything is exact: percentiles interpolate identically in both
    // engines and the comparisons are per-row double ops.
    "q95_mad_outliers" -> ((s, d) => {
      // The distinct-value COUNTS relation feeds all three passes
      // (optimization round 17, guide §2.3/§1.2): median, MAD, and the
      // outlier count each only depend on (event_type, value,
      // multiplicity), so the MAD pass and the final rollup aggregate
      // O(distinct values) rows instead of JOINING the raw events
      // against the broadcast stats and re-windowing corpus-sized input
      // (before: 4 executed scans of events, 8.2 MB; after: 3 scans,
      // 6.1 MB — one per counts branch — and every post-counts operator
      // is distinct-value-sized). Arithmetic is bit-identical: dev
      // depends only on v, and raw row counts are Σ __c over matching
      // distinct values.
      // (counts keeps a null-__v group so the final `n` counts ALL rows
      // exactly like the oracle's count(*); the percentile passes filter
      // it out, matching the original percentiles' null handling)
      val counts = Tables.events(s, d)
        .groupBy(col("event_type"), col("value").cast("double").as("__v"))
        .agg(count(lit(1)).as("__c"))
      val med = ExactPercentile.fromCounts(
        counts.filter(col("__v").isNotNull), Seq("event_type"),
        Seq("med" -> 0.5))
      val mad = ExactPercentile.fromCounts(
        counts.filter(col("__v").isNotNull)
          .join(broadcast(med), "event_type")
          .select(col("event_type"),
            abs(col("__v") - col("med")).as("__v"), col("__c"))
          // med±x collapse to one dev value: re-aggregate so the counts
          // relation is unique per (group, __v) as fromCounts requires
          .groupBy(col("event_type"), col("__v"))
          .agg(sum(col("__c")).as("__c")),
        Seq("event_type"), Seq("mad" -> 0.5))
      val stats = med.join(mad, "event_type")
      counts.join(broadcast(stats), "event_type")
        .groupBy(col("event_type"))
        .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
          sum(when(abs(col("__v") - col("med")) > lit(3.0) * col("mad"),
            col("__c")).otherwise(0L)).as("n_outliers"),
          sum(col("__c")).as("n"))
        .orderBy(col("event_type"))
    }),

    // Peak concurrent sessions — a DISTRIBUTED sweep line. Session
    // intervals (q40's gap rule) become ±1 boundaries, collapsed per
    // distinct timestamp; the prefix sum is two-phase: a within-hour
    // window partitioned by hour (parallel, corpus-sized) plus a global
    // running offset over the per-hour nets — a single-partition window
    // over O(hours) rows, bounded by calendar time, not data volume.
    // Peak AT a timestamp counts sessions ending there as still active
    // (prefix net + n_end). Output: the earliest hour achieving the max.
    "q96_peak_concurrency" -> ((s, d) => {
      val sess = withSessionIds(Tables.events(s, d))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      // one explode, not a union: a union would evaluate the whole
      // sessionization subtree once per branch
      val bounds = sess.select(explode(array(
          struct(col("s_start").as("ts"), lit(1L).as("st"), lit(0L).as("en")),
          struct(col("s_end").as("ts"), lit(0L).as("st"), lit(1L).as("en")))).as("b"))
        .select(col("b.ts").as("ts"), col("b.st").as("st"), col("b.en").as("en"))
      val byTs = bounds.groupBy(col("ts"))
        .agg(sum(col("st")).as("n_start"), sum(col("en")).as("n_end"))
        .withColumn("hr", date_trunc("hour", col("ts")))
      val wh = Window.partitionBy(col("hr")).orderBy(col("ts"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val within = byTs
        .withColumn("cumh", sum(col("n_start") - col("n_end")).over(wh))
        .withColumn("peak_at", col("cumh") + col("n_end"))
      val hours = within.groupBy(col("hr"))
        .agg(sum(col("n_start") - col("n_end")).as("net"), max(col("peak_at")).as("maxp"))
      val wg = Window.orderBy(col("hr")).rowsBetween(Window.unboundedPreceding, -1)
      hours.withColumn("off", coalesce(sum(col("net")).over(wg), lit(0L)))
        .select(col("hr"), (col("off") + col("maxp")).as("peak"))
        .orderBy(desc("peak"), col("hr")).limit(1)
    }),

    "q42_event_pivot" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
        .select(col("day"), col("click").as("n_click"), col("error").as("n_error"),
          col("purchase").as("n_purchase"), col("signup").as("n_signup"),
          col("view").as("n_view"))
        .orderBy(col("day"))
    }),

    // OHLC resampling bars (open/high/low/close per event_type × hour) —
    // the financial/feature-engineering downsample shape. Open/close are
    // per-group argmin/argmax WITHOUT a rank window: min/max of
    // struct(ts, event_id, value) picks the first/last row's value by the
    // (unique) event-time order and stays partial-combinable — one
    // word-count-shaped shuffle on (type, hour), no second rank
    // exchange (the q89 argmax pattern). Volume is the decimal-exact sum.
    "q128_ohlc_bars" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("ts"), col("event_id"), col("value")))
            .getField("value").as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(struct(col("ts"), col("event_id"), col("value")))
            .getField("value").as("close"),
          Exact.moneySum(col("value")).as("volume"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // EWMA smoothing (α = 1/2, 32-tap) of each user's value series — the
    // classic streaming-feature shape (load smoothing, engagement decay).
    // Numeric parity: α = 1/2 makes every weight a POWER OF TWO, so the
    // weighted sum is exact integer arithmetic (4096-scaled values,
    // shift-left weights, BIGINT sum < 2^53) in both engines — a double
    // pow() chain would drift in the last ulp and a fractional α has no
    // exact representation. Frame order inside collect_list is the window
    // order (total: ts, event_id). Shape at scale: ONE shuffle on
    // user_id, one ordered frame pass per partition — the 32-row frame
    // bounds both state and the per-row array; the user_id filter is
    // pushed below the window (partition-key predicate), so only the
    // dumped users are even computed.
    "q126_ewma" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-31, 0)
      Tables.events(s, d)
        .withColumn("frame", collect_list(col("value")).over(w))
        .filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"), col("value"),
          expr("""cast(aggregate(
                    transform(frame, (x, i) ->
                      shiftleft(cast(floor(x * 4096) as bigint), i)),
                    cast(0 as bigint), (a, b) -> a + b) as double)
                  / cast(shiftleft(cast(1 as bigint), size(frame)) - 1 as double)
                  / 4096.0D""").as("ewma"))
        .orderBy(col("user_id"), col("event_id"))
    }))

  def oracle: Map[String, String] = Map(
    "q38_tumbling_hourly" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
          count(*) AS n, ${Exact.sqlMoneySum("value")} AS sum_value,
          min(value) AS min_value, max(value) AS max_value
          FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",

    "q39_sliding_windows" ->
      s"""SELECT win_start, count(*) AS n, ${Exact.sqlMoneySum("value")} AS sum_value
          FROM (SELECT value, unnest([time_bucket(INTERVAL 5 minutes, ts),
                               time_bucket(INTERVAL 5 minutes, ts) - INTERVAL 5 minutes])
                  AS win_start
                FROM events)
          GROUP BY win_start ORDER BY win_start""",

    "q40_sessionize" ->
      s"""SELECT user_id, session_id, count(*) AS n_events,
          min(ts) AS session_start, max(ts) AS session_end,
          CAST(epoch(date_trunc('second', max(ts))) - epoch(date_trunc('second', min(ts))) AS BIGINT) AS duration_secs,
          ${Exact.sqlMoneySum("value")} AS sum_value
          FROM $sqlSessionized
          GROUP BY user_id, session_id ORDER BY user_id, session_id""",

    "q41_asof_join" ->
      """SELECT event_id, key AS user_id, coalesce(last_order, -1) AS last_orderkey
         FROM (SELECT key, t, is_evt, event_id,
             last_value(okey IGNORE NULLS) OVER (PARTITION BY key ORDER BY t, is_evt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_order
           FROM (SELECT o_custkey AS key, o_orderdate AS t, max(o_orderkey) AS okey,
                   0 AS is_evt, CAST(NULL AS BIGINT) AS event_id
                 FROM orders GROUP BY o_custkey, o_orderdate
                 UNION ALL
                 SELECT user_id, ts, CAST(NULL AS BIGINT), 1, event_id FROM events))
         WHERE is_evt = 1 ORDER BY event_id""",

    "q55_time_proximity_join" ->
      """SELECT x.user_id AS user_id, count(*) AS n_pairs,
         count(DISTINCT x.event_id) AS n_left,
         CAST(sum(CASE WHEN x.event_type = y.event_type THEN 1 ELSE 0 END) AS BIGINT)
           AS same_type_pairs
         FROM events x JOIN events y
           ON x.user_id = y.user_id AND x.event_id < y.event_id
           AND abs(epoch_us(y.ts) - epoch_us(x.ts)) <= 300000000
         GROUP BY x.user_id ORDER BY user_id""",

    "q69_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                     WHERE event_type = 'signup' GROUP BY user_id),
          s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                 JOIN s1 ON e.user_id = s1.user_id
                 WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
          s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                 JOIN s2 ON e.user_id = s2.user_id
                 WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
         SELECT step, event_type, count(*) AS n_users FROM (
           SELECT 1 AS step, 'signup' AS event_type FROM s1
           UNION ALL SELECT 2, 'click' FROM s2
           UNION ALL SELECT 3, 'purchase' FROM s3)
         GROUP BY step, event_type ORDER BY step""",

    "q70_event_unpivot" ->
      """SELECT day, event_type, n FROM (
           SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             count(*) AS n
           FROM events GROUP BY 1, 2)
         WHERE n > 0 ORDER BY day, event_type""",

    "q80_pattern_match" ->
      """SELECT user_id, count(*) AS n_matches, min(ts) AS first_match_ts
         FROM (SELECT user_id, event_type, ts,
                 lead(event_type, 1) OVER w AS next_type,
                 lead(ts, 1) OVER w AS next_ts
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         WHERE event_type = 'error' AND next_type = 'purchase'
           AND epoch_us(next_ts) - epoch_us(ts) <= 600000000
         GROUP BY user_id ORDER BY user_id""",

    "q81_transitions" ->
      """SELECT from_type, to_type, n,
           CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
         FROM (SELECT event_type AS from_type, to_type, count(*) AS n
               FROM (SELECT user_id, event_type,
                       lead(event_type, 1) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS to_type
                     FROM events)
               WHERE to_type IS NOT NULL
               GROUP BY 1, 2)
         ORDER BY from_type, to_type""",

    "q94_pagerank" -> {
      def iter(prev: String, out: String): String =
        s"""i_$out AS (SELECT dst, CAST(sum(r * wfp // 1000000) AS BIGINT) AS inflow
              FROM e JOIN $prev ON e.src = $prev.event_type GROUP BY dst),
            $out AS (SELECT nodes.event_type,
                CAST((150000000000 // n) + coalesce(inflow, 0) * 85 // 100 AS BIGINT) AS r
              FROM nodes CROSS JOIN nn LEFT JOIN i_$out ON nodes.event_type = i_$out.dst)"""
      s"""WITH seq AS (SELECT event_type,
              lead(event_type, 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS dst
            FROM events),
          edges AS (SELECT event_type AS src, dst, count(*) AS cnt
                    FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2),
          outs AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS outw
                   FROM edges GROUP BY src),
          e AS (SELECT edges.src, edges.dst,
                  CAST(cnt * 1000000 // outw AS BIGINT) AS wfp FROM edges
                JOIN outs USING (src)),
          nodes AS (SELECT DISTINCT event_type FROM events),
          nn AS (SELECT count(*) AS n FROM nodes),
          r0 AS (SELECT event_type, CAST(1000000000000 // n AS BIGINT) AS r
                 FROM nodes CROSS JOIN nn),
          ${iter("r0", "r1")},
          ${iter("r1", "r2")},
          ${iter("r2", "r3")}
          SELECT event_type, r AS rank_fp FROM r3 ORDER BY event_type"""
    },

    "q82_cohorts" ->
      """SELECT cohort_day,
           CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
           count(DISTINCT user_id) AS n_active
         FROM (SELECT DISTINCT e.user_id,
                 CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS day, cohort_day
               FROM events e
               JOIN (SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort_day
                     FROM events GROUP BY user_id) c ON e.user_id = c.user_id)
         GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset""",

    "q79_scd2_runs" ->
      """SELECT user_id, run_id, min(event_type) AS event_type,
           min(ts) AS valid_from, max(ts) AS valid_to, count(*) AS n_events
         FROM (SELECT user_id, event_type, ts,
                 CAST(sum(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
               FROM (SELECT *,
                       CASE WHEN lag(event_type, 1) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS changed
                     FROM events WHERE user_id < 30))
         GROUP BY user_id, run_id ORDER BY user_id, run_id""",

    "q76_gap_fill" ->
      s"""WITH e AS (SELECT * FROM events WHERE user_id < 50),
          hourly AS (SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                       count(*) AS n, ${Exact.sqlMoneySum("value")} AS hour_value
                     FROM e GROUP BY 1, 2),
          spans AS (SELECT user_id, CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS h0,
                      CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS h1
                    FROM e GROUP BY user_id),
          timeline AS (SELECT user_id,
                         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
                       FROM spans)
          SELECT t.user_id AS user_id, t.hour AS hour,
            CAST(coalesce(n, 0) AS BIGINT) AS n,
            last_value(hour_value IGNORE NULLS) OVER (
              PARTITION BY t.user_id ORDER BY t.hour
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
          FROM timeline t LEFT JOIN hourly h
            ON t.user_id = h.user_id AND t.hour = h.hour
          ORDER BY user_id, hour""",

    "q95_mad_outliers" ->
      """WITH med AS (
           SELECT event_type, quantile_cont(value, 0.5) AS med
           FROM events GROUP BY event_type),
         stats AS (
           SELECT e.event_type, min(m.med) AS med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
           FROM events e JOIN med m USING (event_type)
           GROUP BY e.event_type)
         SELECT e.event_type, min(s.med) AS med, min(s.mad) AS mad,
           CAST(count(*) FILTER (WHERE abs(e.value - s.med) > 3 * s.mad) AS BIGINT) AS n_outliers,
           count(*) AS n
         FROM events e JOIN stats s USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",

    "q96_peak_concurrency" ->
      s"""WITH sess AS (
           SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
           FROM $sqlSessionized
           GROUP BY user_id, session_id),
         b AS (SELECT s_start AS ts, 1 AS st, 0 AS en FROM sess
               UNION ALL SELECT s_end, 0, 1 FROM sess),
         g AS (SELECT ts, sum(st) AS n_start, sum(en) AS n_end FROM b GROUP BY ts),
         c AS (SELECT ts,
                 sum(n_start - n_end) OVER (ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + n_end AS peak_at
               FROM g)
         SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
           CAST(peak_at AS BIGINT) AS peak
         FROM c ORDER BY peak_at DESC, hr, ts LIMIT 1""",

    "q42_event_pivot" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         count(*) FILTER (event_type = 'click') AS n_click,
         count(*) FILTER (event_type = 'error') AS n_error,
         count(*) FILTER (event_type = 'purchase') AS n_purchase,
         count(*) FILTER (event_type = 'signup') AS n_signup,
         count(*) FILTER (event_type = 'view') AS n_view
         FROM events GROUP BY 1 ORDER BY day""",

    "q128_ohlc_bars" ->
      s"""WITH e AS (SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                       ts, event_id, value FROM events),
          r AS (SELECT *,
                  row_number() OVER (PARTITION BY event_type, hour
                    ORDER BY ts, event_id) AS rn_a,
                  row_number() OVER (PARTITION BY event_type, hour
                    ORDER BY ts DESC, event_id DESC) AS rn_d
                FROM e)
          SELECT event_type, hour, count(*) AS n,
            min(CASE WHEN rn_a = 1 THEN value END) AS open,
            max(value) AS high, min(value) AS low,
            min(CASE WHEN rn_d = 1 THEN value END) AS close,
            ${Exact.sqlMoneySum("value")} AS volume
          FROM r GROUP BY event_type, hour ORDER BY event_type, hour""",

    "q126_ewma" ->
      """WITH f AS (
           SELECT user_id, event_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 31 PRECEDING AND CURRENT ROW) AS frame
           FROM events)
         SELECT user_id, event_id, value,
           CAST(list_sum(list_transform(generate_series(1, len(frame)),
               i -> (CAST(floor(frame[i] * 4096) AS BIGINT) << (i - 1)))) AS DOUBLE)
             / CAST((CAST(1 AS BIGINT) << len(frame)) - 1 AS DOUBLE)
             / 4096.0 AS ewma
         FROM f WHERE user_id < 50 ORDER BY user_id, event_id""")
}
