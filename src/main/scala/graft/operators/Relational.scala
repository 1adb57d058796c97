package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Exact
import graft.sources.Tables

/** Relational core over the TPC-H-ish star schema (SURVEY.md §2.2 M1-M2).
  *
  * The reference app has no joins/sorts/aggregation beyond a 3-row string
  * concat (SURVEY.md §2.1) — this module is the driver-mandated
  * generalization to a full relational surface, designed Spark-first:
  * declarative DataFrame plans so Catalyst does pushdown/pruning/join
  * selection; explicit `broadcast()` on dim tables (at 100 TB the dims stay
  * ~MB-scale while facts shuffle); deterministic total ORDER BY on every
  * result for the DuckDB oracle; all money math via [[Exact]] decimal
  * aggregation for bit-stable hashes.
  */
object Relational {
  private def ts(s: String) = to_timestamp(lit(s))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SKYLINE (Pareto-dominance) query — Börzsönyi/Kossmann/Stocker,
    // ICDE 2001, public: per lang, the docs not dominated on
    // (n_tokens, type-token-ratio) — d1 dominates d2 iff ≥ on both and
    // > on one. The axes genuinely TRADE OFF (longer docs repeat more,
    // so TTR falls with length), which is what gives the frontier its
    // shape — the docs that are long AND lexically diverse for their
    // length, the corpus-curation "keep the interesting long tail"
    // query.
    // The naive form is an O(n²) dominance self-join; the sort-based
    // form here is two WINDOW passes riding one exchange: a doc is in
    // the skyline iff its ttr strictly exceeds the max ttr of every
    // strictly-longer-tokened doc (RANGE frame "current value + 1
    // .. ∞" over n_tok) AND equals the max within its own n_tok group
    // (exact ties on both axes are mutually non-dominating — all kept).
    // At 100 TB the lang partitions would pre-shard by an n_tok range
    // with a bounded per-shard frontier merge (the q156 two-phase-rank
    // shape); at these lang cardinalities the single window is the
    // right plan.
    "q175_skyline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(graft.plans.TextExpressions.tokens(col("text")))
            .cast("long").as("n_tok"),
          size(array_distinct(graft.plans.TextExpressions.tokens(col("text"))))
            .cast("long").as("n_type"))
        .filter(col("n_tok") > 0)
        .withColumn("ttr", expr("n_type * 1000000 div n_tok"))
      val wGt = Window.partitionBy(col("lang")).orderBy(col("n_tok"))
        .rangeBetween(1L, Window.unboundedFollowing)
      val wEq = Window.partitionBy(col("lang"), col("n_tok"))
      docs
        .withColumn("mx_gt", max(col("ttr")).over(wGt))
        .withColumn("mx_eq", max(col("ttr")).over(wEq))
        .withColumn("sky",
          when((col("mx_gt").isNull || col("ttr") > col("mx_gt")) &&
            col("ttr") === col("mx_eq"), 1L).otherwise(0L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("sky")).as("n_skyline"),
          sum(when(col("sky") === 1L, col("ttr")).otherwise(0L))
            .as("sky_ttr_sum"),
          max(when(col("sky") === 1L, col("n_tok"))).as("sky_max_tok"))
        .orderBy(col("lang"))
    }),

    // Q1-style pricing summary: full-scan hash aggregate with map-side
    // partial agg; group cardinality is tiny → no skew at any scale.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("2000-01-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Exact.moneySum(col("l_quantity")).as("sum_qty"),
          Exact.moneySum(col("l_extendedprice")).as("sum_base_price"),
          Exact.discRevenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          Exact.chargeSum(col("l_extendedprice"), col("l_discount"), col("l_tax")).as("sum_charge"),
          Exact.moneyAvg(col("l_quantity")).as("avg_qty"),
          Exact.moneyAvg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Pushdown-eligible filter + narrow projection (check PushedFilters).
    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1996-12-31"))
          && col("l_quantity") < 10 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Q3-style: broadcast dim (customer) into fact-fact join, top-10.
    "q03_shipping_priority" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < ts("1998-01-01"))
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1998-01-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Exact.discRevenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    // EXISTS → left-semi join (never materializes the probe side twice).
    "q04_order_priority" -> ((s, d) => {
      val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"))
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q5-style 6-table join; dims broadcast, facts shuffle on join keys.
    "q05_local_supplier" -> ((s, d) => {
      val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, d)
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31")))
      val cust = Tables.customer(s, d)
      val supp = Tables.supplier(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Exact.discRevenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // Q6-style single-pass filtered aggregate (no shuffle beyond 1 row).
    "q06_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(ts("1997-01-01"), ts("1997-12-31"))
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * col("l_discount").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Broadcast-hash join with a dim table; group on dim attribute.
    "q07_brand_volume" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          Exact.moneySum(col("l_quantity")).as("sum_qty"),
          Exact.moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // TPC-H Q8-shaped market share: 7-table star join (lineitem ⋈ part,
    // orders, customer, nation×2, region, supplier), the deepest
    // join-ordering exercise in the suite. Every dim side broadcasts; the
    // fact table is filtered by the selective part brand FIRST (semi
    // join), so the wide join pipeline runs over ~1/25 of lineitem.
    // Share = one double division over two decimal-exact sums; the
    // conditional numerator is a null-skipping sum(when) — same FILTER
    // semantics as the oracle.
    "q101_market_share" -> ((s, d) => {
      val asiaCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("c_custkey"))
      val ords = Tables.orders(s, d)
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("yr"))
      val brandParts = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#13").select(col("p_partkey"))
      val supNation = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val vol = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      Tables.lineitem(s, d)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .select(col("yr"), vol.as("vol"), col("supp_nation"))
        .groupBy(col("yr"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("vol")))
            .cast("double").as("nation_volume"),
          sum(col("vol")).cast("double").as("total_volume"))
        .withColumn("share", col("nation_volume") / col("total_volume"))
        .orderBy(col("yr"))
    }),

    // NOT EXISTS → left-anti join (customers with no 1995 orders).
    "q08_customers_no_orders" -> ((s, d) => {
      val ord95 = Tables.orders(s, d)
        .filter(col("o_orderdate").between(ts("1995-01-01"), ts("1995-12-31")))
      Tables.customer(s, d)
        .join(ord95, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          Exact.moneySum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    // Bloom-filter pre-shuffle join pruning (Spark's runtime-filter
    // pattern, made explicit): one distributed aggregate builds a bloom
    // filter over the selective build side's join keys (a ~128 KB binary
    // scalar — the same thing AQE's InjectRuntimeFilter ships), the fact
    // side probes it BEFORE the join's exchange, and the exact semi join
    // runs on the survivors. Bloom filters have NO false negatives, so the
    // result is bit-identical to the plain semi join — which is exactly
    // what the oracle runs; false positives only cost a little pruning
    // efficiency. At 100 TB the probe drops most fact rows map-side,
    // shrinking the join shuffle by the build side's selectivity.
    "q93_bloom_prune" -> ((s, d) => {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.graftbridge.ColumnBridge
      import org.apache.spark.sql.types.BinaryType
      val sel = Tables.orders(s, d).filter(col("o_totalprice") > 475000.0)
      val bloomAgg = ColumnBridge.column(new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("o_orderkey"))),
        Literal(100000L), Literal(1048576L)).toAggregateExpression())
      val bf = sel.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]]("bf")
      val li = Tables.lineitem(s, d)
      val pruned =
        if (bf == null) li.filter(lit(false)) // empty build side: nothing joins
        else li.filter(ColumnBridge.column(BloomFilterMightContain(
          Literal.create(bf, BinaryType),
          ColumnBridge.expression(xxhash64(col("l_orderkey"))))))
      pruned
        .join(sel.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          Exact.moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // ROLLUP with explicit grouping flags; keys coalesced so neither
    // engine's NULL ordering matters.
    "q09_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(Exact.moneySum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("n"), col("g_flag"), col("g_status"))
        .orderBy(col("g_flag"), col("g_status"), col("rflag"), col("lstatus"))
    }),

    // CUBE over (returnflag, ship year).
    "q10_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("ship_year", year(col("l_shipdate")))
        .cube(col("l_returnflag"), col("ship_year"))
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("ship_year")).cast("int").as("g_year"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("ship_year"), lit(-1)).cast("long").as("ship_year"),
          col("n"), col("g_flag"), col("g_year"))
        .orderBy(col("g_flag"), col("g_year"), col("rflag"), col("ship_year"))
    }),

    // Exact distinct counts (expand + two-phase agg under the hood).
    "q11_distinct_counts" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"))
    }),

    // Ranking window: top-3 orders per customer.
    "q12_top_orders_per_cust" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Running-total frame window (exact decimal inside the frame sum).
    "q13_running_totals" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spend",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // lag/lead analytics: days between consecutive orders per customer.
    "q14_order_gaps" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("next_key", coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)))
        .withColumn("gap_days",
          coalesce(datediff(col("o_orderdate"), col("prev_date")), lit(-1)).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("gap_days"), col("next_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Set ops: repeat buyers (1995 ∩ 1996) minus MACHINERY customers.
    "q15_set_ops" -> ((s, d) => {
      val ord = Tables.orders(s, d)
      def buyers(y0: String, y1: String) =
        ord.filter(col("o_orderdate").between(ts(y0), ts(y1)))
          .select(col("o_custkey").as("custkey"))
      val machinery = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("custkey"))
      buyers("1995-01-01", "1995-12-31")
        .intersect(buyers("1996-01-01", "1996-12-31"))
        .except(machinery)
        .orderBy(col("custkey"))
    }),

    // Scalar string-function battery (all codegen'd built-ins).
    "q16_string_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          lower(col("p_name")).as("name_lc"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_type"), 1, 5).as("type5"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_replace(col("p_name"), " ", "_").as("name_us"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))
    }),

    // date_trunc tumbling rollup of order revenue by month.
    "q17_monthly_revenue" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(Exact.moneySum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("month"))
    }),

    // JSON scalar extraction from events.props.
    "q18_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // Date-function battery (only cross-engine-stable parts: no week-of-
    // year or fractional month arithmetic, whose conventions differ).
    "q52_date_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          date_add(col("o_orderdate"), 30).cast("timestamp").as("due"),
          last_day(col("o_orderdate")).cast("timestamp").as("month_end"))
        .orderBy(col("o_orderkey"))
    }),

    // JSON → MAP column semantics over events.props.
    "q53_map_funcs" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
        .select(col("event_id"),
          array_join(map_keys(col("m")), ",").as("keys"),
          element_at(col("m"), "k").as("k_val"),
          size(map_keys(col("m"))).cast("long").as("n_keys"))
        .orderBy(col("event_id"))
    }),

    // Array-function battery over the embedding column: size, indexing,
    // fold (sequential double accumulation — see VectorFunctions), slicing.
    "q20_array_funcs" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_elem"),
          graft.functions.VectorFunctions.norm(col("embedding")).as("norm"),
          size(slice(col("embedding"), 1, 8)).cast("long").as("head_len"))
        .orderBy(col("vec_id"))
    }),

    // Exact interpolated percentiles (== DuckDB quantile_cont,
    // bit-identical: both sort and linearly interpolate at p*(n-1)),
    // computed via ExactPercentile — distinct-value counts + cumulative
    // windows, so no task ever buffers a group's raw values (Spark's
    // `percentile` ImperativeAggregate would).
    "q49_percentiles" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val price = ExactPercentile.percentiles(li, Seq("l_returnflag"),
        col("l_extendedprice"), Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
      val qty = ExactPercentile.percentiles(li, Seq("l_returnflag"),
        col("l_quantity"), Seq("qty_p90" -> 0.9))
      price.join(qty, "l_returnflag").orderBy(col("l_returnflag"))
    }),

    // Percentile sketch next to the exact percentile — the 100 TB stand-in
    // for q49 (exact percentiles shuffle raw values; the sketch is bounded
    // per group).
    // Percentile-sketch surface, oracled through its CONTRACT: the exact
    // percentiles hash-match DuckDB bit-for-bit (percentile ==
    // quantile_cont), and each engine checks its OWN sketch against its
    // own exact values within the 2% bound — the raw sketch values are
    // engine-specific (different t-digest/GK impls) and deliberately not
    // in the output. Empirical margins are ~0.05% on both engines, 40×
    // inside the bound; the unit test additionally pins Spark's error.
    "q59_approx_percentile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val exact = ExactPercentile.percentiles(li, Seq("l_returnflag"),
        col("l_extendedprice"), Seq("exact_p50" -> 0.5, "exact_p95" -> 0.95))
      li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("ap"))
        .join(broadcast(exact), "l_returnflag")
        .select(col("l_returnflag"), col("exact_p50"), col("exact_p95"),
          (abs(element_at(col("ap"), 1) - col("exact_p50")) / col("exact_p50") < 0.02
            && abs(element_at(col("ap"), 2) - col("exact_p95")) / col("exact_p95") < 0.02)
            .as("sketch_within_2pct"))
        .orderBy(col("l_returnflag"))
    }),

    // HLL-sketch surface, oracled through its CONTRACT (see q59): exact
    // distinct counts hash-match; each engine verifies its own HLL within
    // 5% of its own exact count (both are ~0.4% off empirically). The raw
    // sketch estimate is engine-specific and excluded from the output.
    "q44_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double")
            / col("exact_parts").cast("double") < 0.05).as("sketch_within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    // Math-function battery. Only operations that are bit-exact across
    // engines: sqrt is IEEE-754 correctly rounded everywhere; abs/ceil/
    // floor/round/sign/mod/greatest/least involve no transcendental libm
    // (whose last-ulp behavior differs between JVM and DuckDB — ln/exp/pow
    // are deliberately absent from the oracled surface).
    "q56_math_funcs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          sqrt(col("l_extendedprice")).as("sqrt_price"),
          abs(col("l_discount") - 0.05).as("abs_disc"),
          ceil(col("l_extendedprice")).as("ceil_price"),
          floor(col("l_extendedprice")).as("floor_price"),
          round(col("l_extendedprice")).as("round_price"),
          signum(col("l_quantity") - 25).cast("long").as("sign_qty"),
          (col("l_quantity").cast("long") % 7).as("qty_mod7"),
          greatest(col("l_tax"), col("l_discount")).as("max_rate"),
          least(col("l_tax"), col("l_discount")).as("min_rate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Conditional derived columns (reference op #10: lakehouse_app_helpers.py:36).
    "q19_conditional_derive" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F", "done")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("partial").as("status_label"),
          when(substring(col("o_orderpriority"), 1, 1) === "1", "urgent")
            .otherwise("normal").as("prio_label"),
          when(col("o_totalprice") > 200000, concat(lit("order/"), col("o_orderkey"), lit("/logz")))
            .otherwise("").as("logz_url"))
        .orderBy(col("o_orderkey"))
    }),

    // RANGE window frame (vs q13's ROWS): trailing-7-day spend per
    // customer — the frame is VALUE-bounded (epoch seconds), so all
    // equal-time peers join the frame together in both engines. Decimal
    // sum inside the frame: exact, order-free.
    "q87_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("epoch_s"))
        .rangeBetween(-604800L, 0L)
      Tables.orders(s, d)
        .filter(col("o_custkey") < 200)
        .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
        .withColumn("spend_7d",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
        .withColumn("n_7d", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("spend_7d"), col("n_7d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Full-outer join: per-nation customer vs supplier counts — only 10
    // suppliers across 25 nations, so the outer sides carry real nulls,
    // coalesced to 0 (and the join key via coalesce of both sides).
    "q85_full_outer_join" -> ((s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // Multiset set operations (ALL variants — q15 covers the DISTINCT
    // forms): 1995 vs 1996 order-priority bags through UNION ALL /
    // INTERSECT ALL / EXCEPT ALL, aggregated to counts for stable output.
    "q86_set_ops_all" -> ((s, d) => {
      val ord = Tables.orders(s, d)
      def prios(y0: String, y1: String) =
        ord.filter(col("o_orderdate").between(ts(y0), ts(y1)))
          .select(col("o_orderpriority"))
      val a = prios("1995-01-01", "1995-12-31")
      val b = prios("1996-01-01", "1996-12-31")
      def counted(df: org.apache.spark.sql.DataFrame, name: String) =
        df.groupBy(col("o_orderpriority")).agg(count(lit(1)).as(name))
      counted(a.union(b), "n_union_all")
        .join(counted(a.intersectAll(b), "n_intersect_all"), Seq("o_orderpriority"), "left")
        .join(counted(a.exceptAll(b), "n_except_all"), Seq("o_orderpriority"), "left")
        .select(col("o_orderpriority"),
          col("n_union_all"),
          coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"),
          coalesce(col("n_except_all"), lit(0L)).as("n_except_all"))
        .orderBy(col("o_orderpriority"))
    }),

    // Null-semantics battery: nullif-manufactured nulls through coalesce,
    // null-safe equality (<=>), count(col) vs count(*), and null-keyed
    // grouping (coalesced for cross-engine ordering).
    "q83_null_semantics" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("st"),
          nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("prio"))
        .groupBy(coalesce(col("st"), lit("_null_")).as("st_key"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("st")).as("n_nonnull_st"),
          count(col("prio")).as("n_nonnull_prio"),
          sum(when(col("st") <=> col("prio"), 1L).otherwise(0L)).as("nullsafe_eq"),
          sum(when(col("st").isNull && col("prio").isNull, 1L).otherwise(0L)).as("both_null"))
        .orderBy(col("st_key"))
    }),

    // Second string battery: pad/translate/repeat/reverse/overlay-style
    // ops beyond q16 (all pure byte/char transforms — engine-identical).
    "q84_string_funcs2" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          lpad(col("p_name"), 20, ".").as("padded_l"),
          rpad(col("p_brand"), 12, "#").as("padded_r"),
          translate(col("p_type"), "aeiou", "AEIOU").as("vowels_up"),
          reverse(col("p_name")).as("rev_name"),
          repeat(substring(col("p_brand"), 1, 5), 2).as("brand2x"),
          concat(upper(substring(col("p_name"), 1, 1)),
            substring(col("p_name"), 2, 1000000)).as("title_name"),
          ascii(col("p_name")).cast("long").as("first_code"),
          chr(lit(65) + (col("p_partkey") % 26)).as("letter"))
        .orderBy(col("p_partkey"))
    }),

    // Window-function battery: ranking + distribution + value-access
    // functions over one per-customer ordered window. percent_rank and
    // cume_dist are single divisions of integer ranks — deterministic.
    "q72_window_funcs" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .filter(col("o_custkey") < 300)
        .select(col("o_custkey"), col("o_orderkey"),
          dense_rank().over(w).cast("long").as("drank"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"),
          first(col("o_orderkey")).over(frame).as("first_order"),
          last(col("o_orderkey")).over(frame).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(frame).as("second_order"),
          lead(col("o_orderkey"), 1, -1L).over(w).as("next_order"),
          lag(col("o_orderkey"), 2, -1L).over(w).as("prev2_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Quantile binning (ntile) — the feature-engineering bucketizer q72's
    // battery doesn't cover: quartile customers by exact total spend
    // within their market segment, then per-bucket stats. ntile follows
    // the SQL-standard fill (first n mod k buckets get the extra row) in
    // both engines; the (spend DESC, custkey) order is total, so bucket
    // edges are deterministic. Shape at scale: spend agg shuffles on
    // custkey, the window shuffles on segment — both key-bounded; the
    // final agg rides the window's partitioning.
    "q129_ntile_buckets" -> ((s, d) => {
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(Exact.moneySum(col("o_totalprice")).as("spend"))
      val cust = Tables.customer(s, d)
        .join(spend, col("c_custkey") === col("o_custkey"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(desc("spend"), col("c_custkey"))
      cust.withColumn("quartile", ntile(4).over(w).cast("long"))
        .groupBy(col("c_mktsegment"), col("quartile"))
        .agg(count(lit(1)).as("n_cust"),
          min(col("spend")).as("min_spend"),
          max(col("spend")).as("max_spend"))
        .orderBy(col("c_mktsegment"), col("quartile"))
    }),

    // Pearson correlation from EXACT decimal moments: built-in corr() sums
    // doubles in shuffle order (not bit-reproducible, and DuckDB's differs),
    // so the five moments are decimal-exact sums and the corr formula runs
    // once on their double casts — identical operation order both engines.
    "q66_exact_corr" -> ((s, d) => {
      val x = col("l_quantity").cast("decimal(18,2)")
      val y = col("l_extendedprice").cast("decimal(18,2)")
      def D(c: org.apache.spark.sql.Column) = c.cast("double")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          ((D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy")))
            / (sqrt(D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx")))
              * sqrt(D(col("n")) * D(col("syy")) - D(col("sy")) * D(col("sy")))))
            .as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Fixed-width histogram buckets × ntile quartiles (integer counts,
    // total-ordered ntile → fully deterministic binning).
    "q67_price_histogram" -> ((s, d) => {
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("bucket", floor(col("o_totalprice") / 50000).cast("long"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .groupBy(col("bucket"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("bucket"), col("quartile"))
    }))

  def oracle: Map[String, String] = Map(
    "q175_skyline" ->
      s"""WITH t0 AS (SELECT doc_id, lang,
                CAST(len(${graft.functions.TextFunctions.sqlToks}) AS BIGINT) AS n_tok,
                CAST(len(${graft.functions.TextFunctions.sqlTokSet}) AS BIGINT) AS n_type
              FROM documents),
          t AS (SELECT doc_id, lang, n_tok,
                  n_type * 1000000 // n_tok AS ttr
                FROM t0 WHERE n_tok > 0),
          w AS (SELECT lang, ttr,
                  max(ttr) OVER (PARTITION BY lang ORDER BY n_tok
                    RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mx_gt,
                  max(ttr) OVER (PARTITION BY lang, n_tok) AS mx_eq,
                  n_tok
                FROM t),
          s AS (SELECT lang, ttr, n_tok,
                  CASE WHEN (mx_gt IS NULL OR ttr > mx_gt)
                    AND ttr = mx_eq THEN 1 ELSE 0 END AS sky
                FROM w)
          SELECT lang, count(*) AS n_docs,
            CAST(sum(sky) AS BIGINT) AS n_skyline,
            CAST(sum(CASE WHEN sky = 1 THEN ttr ELSE 0 END) AS BIGINT)
              AS sky_ttr_sum,
            max(CASE WHEN sky = 1 THEN n_tok END) AS sky_max_tok
          FROM s GROUP BY lang ORDER BY lang""",

    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${Exact.sqlMoneySum("l_quantity")} AS sum_qty,
         ${Exact.sqlMoneySum("l_extendedprice")} AS sum_base_price,
         ${Exact.sqlDiscRevenueSum("l_extendedprice", "l_discount")} AS sum_disc_price,
         ${Exact.sqlChargeSum("l_extendedprice", "l_discount", "l_tax")} AS sum_charge,
         ${Exact.sqlMoneyAvg("l_quantity")} AS avg_qty,
         ${Exact.sqlMoneyAvg("l_extendedprice")} AS avg_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
           AND l_quantity < 10 AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",

    "q03_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         ${Exact.sqlDiscRevenueSum("l_extendedprice", "l_discount")} AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q05_local_supplier" ->
      s"""SELECT n_name,
         ${Exact.sqlDiscRevenueSum("l_extendedprice", "l_discount")} AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q06_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q07_brand_volume" ->
      s"""SELECT p_brand, count(*) AS n_items,
         ${Exact.sqlMoneySum("l_quantity")} AS sum_qty,
         ${Exact.sqlMoneySum("l_extendedprice")} AS sum_price
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",

    "q101_market_share" ->
      """SELECT yr,
         CAST(sum(vol) FILTER (WHERE supp_nation = 'NATION_3') AS DOUBLE) AS nation_volume,
         CAST(sum(vol) AS DOUBLE) AS total_volume,
         CAST(sum(vol) FILTER (WHERE supp_nation = 'NATION_3') AS DOUBLE)
           / CAST(sum(vol) AS DOUBLE) AS share
         FROM (
           SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS vol,
             n2.n_name AS supp_nation
           FROM lineitem
           JOIN part ON p_partkey = l_partkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON n1.n_nationkey = c_nationkey
           JOIN region ON r_regionkey = n1.n_regionkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation n2 ON n2.n_nationkey = s_nationkey
           WHERE r_name = 'ASIA' AND p_brand = 'Brand#13')
         GROUP BY yr ORDER BY yr""",

    "q08_customers_no_orders" ->
      s"""SELECT c_mktsegment, count(*) AS n_customers,
         ${Exact.sqlMoneySum("c_acctbal")} AS sum_acctbal
         FROM customer WHERE NOT EXISTS
           (SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q93_bloom_prune" ->
      s"""SELECT l_returnflag, count(*) AS n_lines,
         ${Exact.sqlMoneySum("l_extendedprice")} AS sum_price
         FROM lineitem WHERE EXISTS
           (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey
            AND o_totalprice > 475000.0)
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q09_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rflag,
         coalesce(l_linestatus, 'ALL') AS lstatus,
         ${Exact.sqlMoneySum("l_quantity")} AS sum_qty, count(*) AS n,
         CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
         CAST(GROUPING(l_linestatus) AS INT) AS g_status
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY g_flag, g_status, rflag, lstatus""",

    "q10_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
         coalesce(year(l_shipdate), -1) AS ship_year, count(*) AS n,
         CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
         CAST(GROUPING(year(l_shipdate)) AS INT) AS g_year
         FROM lineitem GROUP BY CUBE (l_returnflag, year(l_shipdate))
         ORDER BY g_flag, g_year, rflag, ship_year""",

    "q11_distinct_counts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q12_top_orders_per_cust" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q13_running_totals" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "q14_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
         coalesce(date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate), -1) AS gap_days,
         coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_key
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "q15_set_ops" ->
      """(SELECT DISTINCT o_custkey AS custkey FROM orders
          WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'
          INTERSECT
          SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31')
         EXCEPT
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
         ORDER BY custkey""",

    "q16_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS name_lc, upper(p_brand) AS brand_uc,
         substring(p_type, 1, 5) AS type5, length(p_name) AS name_len,
         regexp_replace(p_name, ' ', '_', 'g') AS name_us,
         concat(p_brand, '#', p_type) AS brand_type
         FROM part ORDER BY p_partkey""",

    "q17_monthly_revenue" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         ${Exact.sqlMoneySum("o_totalprice")} AS revenue, count(*) AS n_orders
         FROM orders GROUP BY 1 ORDER BY month""",

    "q18_json_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
         max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q52_date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
         day(o_orderdate) AS dom, quarter(o_orderdate) AS q,
         dayofyear(o_orderdate) AS doy,
         CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due,
         CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
         FROM orders ORDER BY o_orderkey""",

    "q53_map_funcs" ->
      """SELECT event_id,
         array_to_string(json_keys(props), ',') AS keys,
         CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
         len(json_keys(props)) AS n_keys
         FROM events ORDER BY event_id""",

    "q44_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
         (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
            / CAST(count(DISTINCT l_partkey) AS DOUBLE) < 0.05) AS sketch_within_5pct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q59_approx_percentile" ->
      """SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.5) AS exact_p50,
         quantile_cont(l_extendedprice, 0.95) AS exact_p95,
         (abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
            / quantile_cont(l_extendedprice, 0.5) < 0.02
          AND abs(approx_quantile(l_extendedprice, 0.95) - quantile_cont(l_extendedprice, 0.95))
            / quantile_cont(l_extendedprice, 0.95) < 0.02) AS sketch_within_2pct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q49_percentiles" ->
      """SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.25) AS p25,
         quantile_cont(l_extendedprice, 0.5) AS p50,
         quantile_cont(l_extendedprice, 0.75) AS p75,
         quantile_cont(l_quantity, 0.9) AS qty_p90
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q20_array_funcs" ->
      s"""SELECT vec_id, label, len(embedding) AS dim,
          CAST(embedding[1] AS DOUBLE) AS first_elem,
          ${graft.functions.VectorFunctions.sqlNorm("embedding")} AS norm,
          len(embedding[1:8]) AS head_len
          FROM embeddings ORDER BY vec_id""",

    "q56_math_funcs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         sqrt(l_extendedprice) AS sqrt_price,
         abs(l_discount - 0.05) AS abs_disc,
         CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
         CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
         round(l_extendedprice) AS round_price,
         CAST(sign(l_quantity - 25) AS BIGINT) AS sign_qty,
         CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
         greatest(l_tax, l_discount) AS max_rate,
         least(l_tax, l_discount) AS min_rate
         FROM lineitem WHERE l_orderkey < 200
         ORDER BY l_orderkey, l_linenumber""",

    "q19_conditional_derive" ->
      """SELECT o_orderkey,
         CASE o_orderstatus WHEN 'F' THEN 'done' WHEN 'O' THEN 'open'
           ELSE 'partial' END AS status_label,
         CASE WHEN substring(o_orderpriority, 1, 1) = '1' THEN 'urgent'
           ELSE 'normal' END AS prio_label,
         CASE WHEN o_totalprice > 200000
           THEN concat('order/', o_orderkey, '/logz') ELSE '' END AS logz_url
         FROM orders ORDER BY o_orderkey""",

    "q87_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_7d,
           count(*) OVER w AS n_7d
         FROM (SELECT *, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
               FROM orders WHERE o_custkey < 200)
         WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_s
                      RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",

    "q85_full_outer_join" ->
      """SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
           CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
           CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
         FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
         FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_supp
                          FROM supplier GROUP BY 1) s
           ON c_nationkey = s_nationkey
         ORDER BY nationkey""",

    "q86_set_ops_all" ->
      """WITH a AS (SELECT o_orderpriority FROM orders
                    WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'),
          b AS (SELECT o_orderpriority FROM orders
                WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'),
          u AS (SELECT o_orderpriority, count(*) AS n_union_all
                FROM (SELECT * FROM a UNION ALL SELECT * FROM b) GROUP BY 1),
          i AS (SELECT o_orderpriority, count(*) AS n_intersect_all
                FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1),
          x AS (SELECT o_orderpriority, count(*) AS n_except_all
                FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1)
         SELECT u.o_orderpriority AS o_orderpriority, n_union_all,
           CAST(coalesce(n_intersect_all, 0) AS BIGINT) AS n_intersect_all,
           CAST(coalesce(n_except_all, 0) AS BIGINT) AS n_except_all
         FROM u LEFT JOIN i ON u.o_orderpriority = i.o_orderpriority
                LEFT JOIN x ON u.o_orderpriority = x.o_orderpriority
         ORDER BY o_orderpriority""",

    "q83_null_semantics" ->
      """SELECT coalesce(st, '_null_') AS st_key, count(*) AS n_rows,
           count(st) AS n_nonnull_st, count(prio) AS n_nonnull_prio,
           CAST(sum(CASE WHEN st IS NOT DISTINCT FROM prio THEN 1 ELSE 0 END) AS BIGINT)
             AS nullsafe_eq,
           CAST(sum(CASE WHEN st IS NULL AND prio IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS both_null
         FROM (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st,
                 nullif(o_orderpriority, '3-MEDIUM') AS prio
               FROM orders)
         GROUP BY st_key ORDER BY st_key""",

    "q84_string_funcs2" ->
      """SELECT p_partkey,
           lpad(p_name, 20, '.') AS padded_l,
           rpad(p_brand, 12, '#') AS padded_r,
           translate(p_type, 'aeiou', 'AEIOU') AS vowels_up,
           reverse(p_name) AS rev_name,
           repeat(substring(p_brand, 1, 5), 2) AS brand2x,
           upper(substring(p_name, 1, 1)) || substring(p_name, 2) AS title_name,
           CAST(ascii(p_name) AS BIGINT) AS first_code,
           chr(CAST(65 + p_partkey % 26 AS INT)) AS letter
         FROM part WHERE p_partkey <= 200
         ORDER BY p_partkey""",

    "q72_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
         CAST(dense_rank() OVER w AS BIGINT) AS drank,
         percent_rank() OVER w AS prank,
         cume_dist() OVER w AS cdist,
         first_value(o_orderkey) OVER wf AS first_order,
         last_value(o_orderkey) OVER wf AS last_order,
         nth_value(o_orderkey, 2) OVER wf AS second_order,
         lead(o_orderkey, 1, -1) OVER w AS next_order,
         lag(o_orderkey, 2, -1) OVER w AS prev2_order
         FROM orders WHERE o_custkey < 300
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",

    "q129_ntile_buckets" ->
      s"""WITH spend AS (SELECT o_custkey, ${graft.functions.Exact.sqlMoneySum("o_totalprice")} AS spend
                         FROM orders GROUP BY o_custkey),
          q AS (SELECT c_mktsegment, spend,
                  CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                    ORDER BY spend DESC, c_custkey) AS BIGINT) AS quartile
                FROM customer JOIN spend ON c_custkey = o_custkey)
          SELECT c_mktsegment, quartile, count(*) AS n_cust,
            min(spend) AS min_spend, max(spend) AS max_spend
          FROM q GROUP BY 1, 2 ORDER BY c_mktsegment, quartile""",

    "q66_exact_corr" ->
      """SELECT l_returnflag, n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS corr_qty_price
         FROM (SELECT l_returnflag, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
               FROM (SELECT l_returnflag,
                       CAST(l_quantity AS DECIMAL(18,2)) AS x,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS y
                     FROM lineitem)
               GROUP BY l_returnflag)
         ORDER BY l_returnflag""",

    "q67_price_histogram" ->
      """SELECT bucket, quartile, count(*) AS n,
         min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
         FROM (SELECT o_orderkey, o_totalprice,
                 CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
                 CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
               FROM orders)
         GROUP BY bucket, quartile ORDER BY bucket, quartile""")
}
