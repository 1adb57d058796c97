package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{Exact, TextFunctions => T}
import graft.sources.Tables

/** Composite + advanced relational shapes (SURVEY.md §2.2 M2/M4).
  *
  * q50 is the flagship LLM-training-data pipeline: quality filter →
  * near-dup removal → corpus stats, expressed as ONE declarative plan.
  * Numeric note: group outputs over doubles use only order-independent
  * aggregates (min/max/count/integer sums) — a parallel double SUM is not
  * bit-reproducible, so it never appears in oracled output.
  */
object Pipelines {

  /** q147's per-source token budget — fixed (not SF-scaled) so the
    * selection frontier is genuinely partial at every SF. */
  private val TokenBudgetPerSource = 1000L

  // --- DSIR importance selection (q160) -----------------------------------

  /** Hashed-feature space size (Xie et al. 2023 "Data Selection for
    * Language Models via Importance Resampling" uses 10k hashed bigram
    * buckets; 1024 keeps the oracle's unrolled arithmetic readable). */
  private val DsirBuckets = 1024L

  /** Fixed-point log2 of the smoothed probability ratio — the shared
    * cross-engine primitive ([[graft.functions.TextFunctions.ilog2Fp]];
    * see q130's note on why libm ln never appears in oracled output). */
  private[operators] def ilog2Fp(num: Long, den: Long): Long =
    T.ilog2Fp(num, den)

  /** Per-doc hashed n-gram feature counts (doc_id, lang, source, b, n):
    * unigrams ∪ bigrams, md5-hashed into [[DsirBuckets]] buckets — the
    * DSIR feature space. RelationCache'd: the bucket-total pass and the
    * per-doc scoring pass both ride one tokenization. */
  private def dsirFeatures(s: SparkSession, d: String): DataFrame =
    graft.sources.RelationCache.of(s, "pipelines.dsirFeatures", d) {
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(concat(
            graft.plans.TextExpressions.tokens(col("text")),
            graft.plans.TextExpressions.adjacentPairs(col("text")))).as("feat"))
        .withColumn("b", T.md5Prefix(col("feat"), 8) % DsirBuckets)
        .groupBy(col("doc_id"), col("lang"), col("source"), col("b"))
        .agg(count(lit(1)).as("n"))
    }

  /** Per-doc NB margin (doc_id, lang, m) over the cached weight table —
    * the shared serving relation of q174 (accuracy) and q178
    * (calibration). Weights are the fixed-point log2 class-conditional
    * count ratios, one bounded 1024-row driver sync, RelationCache'd. */
  private def nbMargins(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feats = dsirFeatures(s, d)
    val wdf = graft.sources.RelationCache.of(s, "pipelines.nbWeights", d) {
      val cnt = feats.groupBy(col("b"))
        .agg(sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("t"),
          sum(when(col("lang") =!= "en", col("n")).otherwise(0L)).as("sc"))
        .collect()
      val tTot = cnt.map(_.getLong(1)).sum
      val sTot = cnt.map(_.getLong(2)).sum
      cnt.toSeq.map { r =>
        (r.getLong(0),
          ilog2Fp((r.getLong(1) + 1) * (sTot + DsirBuckets),
            (r.getLong(2) + 1) * (tTot + DsirBuckets)))
      }.toDF("b", "w")
    }
    graft.sources.RelationCache.of(s, "pipelines.nbMargins", d) {
      feats.join(broadcast(wdf), "b")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("n") * col("w")).as("m"))
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LEARNED in-engine classifier — the model-based filtering stage
    // every production curation stack runs (CCNet/LLaMA-style linear
    // text filters), as MULTINOMIAL NAIVE BAYES over the hashed
    // unigram∪bigram features (the RelationCache'd DSIR relation):
    // per-bucket weight = fixed-point log2 of the add-1-smoothed
    // class-conditional count ratio (t+1)(S+B) / (s+1)(T+B) — the q160
    // machinery re-used as a CLASSIFIER, with both class-conditional
    // distributions instead of target-vs-pool — and a doc's margin is
    // the exact integer dot product Σ n_b·w_b riding the feature
    // shuffle. Trained and evaluated on the corpus (train accuracy =
    // the separability audit: ~83% on the en/non-en boundary here; a
    // batch perceptron was tried and oscillates — NB's closed form has
    // no learning-rate float and no convergence question, which is what
    // makes it bit-reproducible in the oracle). Weight table = one
    // bounded 1024-row collect (the k-means-centroid sync shape);
    // per-class confusion reported per lang.
    "q174_nb_classifier" -> ((s, d) =>
      nbMargins(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when((col("m") > 0) === (col("lang") === "en"), 1L)
            .otherwise(0L)).as("n_correct"))
        .orderBy(col("lang"))),

    // CALIBRATION curve of the q174 model — the other half of a
    // model-based filter's acceptance test: bucket the corpus by NB
    // margin (11 fixed-width bins derived from the corpus max |margin|,
    // so the binning is data-derived yet deterministic and
    // SQL-mirrorable) and report the empirical English rate per bin. A
    // monotone en_frac across bins means the margin ORDERS docs
    // usefully even where the sign is wrong — the property thresholded
    // filtering actually relies on. Shares the cached weight table and
    // margin relation with q174; the only new work is one 11-row
    // rollup.
    "q178_nb_calibration" -> ((s, d) => {
      val m = nbMargins(s, d)
      val mx = m.agg(max(abs(col("m")))).collect()(0).getLong(0)
      m.withColumn("bin", expr(s"(m * 5) div ${mx + 1}"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
        .select(col("bin"), col("n_docs"), col("n_en"),
          expr("n_en * 1000000 div n_docs").as("en_frac_micro"))
        .orderBy(col("bin"))
    }),

    // DSIR importance selection (Xie et al. 2023): score every raw doc
    // by how much its hashed n-gram profile looks like the TARGET
    // distribution (here: the English slice) relative to the raw pool,
    // then keep the global top-100. Per-bucket weight = fixed-point
    // log2 of the add-1-smoothed probability ratio — computed in exact
    // integer arithmetic on the DRIVER over the 1024-row bucket table
    // (corpus-size-independent, the k-means-centroid sync shape) and
    // broadcast back; a doc's score is then an exact integer dot
    // product Σ n_b·wt_b riding the feature shuffle. Selection is
    // TakeOrderedAndProject (top-100), never a global sort. Reported
    // per source: pool size, how many docs the target pulled in, and
    // the selected mass — the audit a mixture built this way needs.
    "q160_dsir_select" -> ((s, d) => {
      val feats = dsirFeatures(s, d)
      val bstats = feats.groupBy(col("b"))
        .agg(sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("t"),
          sum(col("n")).as("s0"))
        .collect()
      val tTot = bstats.map(_.getLong(1)).sum
      val sTot = bstats.map(_.getLong(2)).sum
      val wts = bstats.map { r =>
        (r.getLong(0),
          ilog2Fp((r.getLong(1) + 1) * (sTot + DsirBuckets),
            (r.getLong(2) + 1) * (tTot + DsirBuckets)))
      }.toSeq
      import s.implicits._
      val wdf = wts.toDF("b", "wt")
      val scores = feats
        .join(broadcast(wdf), "b")
        .groupBy(col("doc_id"), col("source"))
        .agg(sum(col("n") * col("wt")).as("score"))
      val picked = scores
        .orderBy(col("score").desc, col("doc_id")).limit(100)
      Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .join(picked.groupBy(col("source"))
          .agg(count(lit(1)).as("n_selected"), sum(col("score")).as("sel_score")),
          Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_selected"), lit(0L)).as("n_selected"),
          coalesce(col("sel_score"), lit(0L)).as("sel_score"))
        .orderBy(col("source"))
    }),
    // Token-budget selection: fill each source's token budget with its
    // best-quality documents — the "give me the best 10B tokens per
    // domain" primitive that turns a mixture plan into a concrete
    // training set. Greedy by (quality desc, doc_id): a window prefix
    // sum of integer token counts per source, cut at the budget. One
    // shuffle on source; the cumulative sum is integer-exact, so the
    // same documents are selected on any cluster size (no float
    // accumulation order in the cut decision). Reported per source:
    // docs taken, tokens used, and the quality frontier (score of the
    // worst admitted doc).
    "q147_token_budget" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        size(graft.plans.TextExpressions.tokens(col("text"))).cast("long")
          .as("n_tokens"),
        graft.plans.TextExpressions.qualityScore(col("text")).as("score"))
      val w = Window.partitionBy(col("source"))
        .orderBy(desc("score"), col("doc_id"))
      docs.withColumn("cum", sum(col("n_tokens")).over(w))
        .filter(col("cum") <= TokenBudgetPerSource)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens_used"),
          min(col("score")).as("frontier_score"))
        .orderBy(col("source"))
    }),

    // EFFECTIVE corpus size under near-dup collapse — the "how much
    // unique data do I actually have per language" metric that decides
    // whether a source is worth more epochs: each q68 duplicate cluster
    // contributes ONE document, so n_effective = n_docs - Σ(|cluster|-1),
    // clusters attributed to their representative's language (the min
    // doc id — deterministic). Reads q68's RelationCache'd converged
    // cluster relation directly (same caps, same threshold), so the two
    // queries can never disagree about what a duplicate is AND the
    // connected-components loop runs once per corpus, not once per
    // consumer.
    "q152_effective_corpus" -> ((s, d) => {
      val clusters = Dedup.dupClusters(s, d)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val excess = clusters
        .join(docs, clusters("cluster_rep") === docs("doc_id"))
        .groupBy(col("lang"))
        .agg(sum(col("n_members") - 1).as("dup_excess"))
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .join(excess, Seq("lang"), "left")
        .withColumn("dup_excess", coalesce(col("dup_excess"), lit(0L)))
        .withColumn("n_effective", col("n_docs") - col("dup_excess"))
        .select(col("lang"), col("n_docs"), col("dup_excess"), col("n_effective"))
        .orderBy(col("lang"))
    }),

    // Ordered, limited string aggregation per group (generalizes op #12).
    "q46_grouped_string_agg" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang")).orderBy(desc("n"), col("source"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy(col("lang"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn").as("rn"), col("source").as("source")))),
          x => x.getField("source")), ",").as("top_sources"))
        .orderBy(col("lang"))
    }),

    // Window-aggregate comparison against the group mean (exact decimal
    // sum / count → one double division, both engines identical).
    "q47_above_segment_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
      Tables.customer(s, d)
        .withColumn("seg_avg",
          sum(col("c_acctbal").cast("decimal(18,2)")).over(w).cast("double")
            / count(lit(1)).over(w))
        .filter(col("c_acctbal") > col("seg_avg") * 1.5)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"), col("seg_avg"))
        .orderBy(col("c_custkey"))
    }),

    // Two-hop semi join: orders containing a Brand#13 part.
    "q48_two_hop_semi" -> ((s, d) => {
      val brandParts = Tables.part(s, d).filter(col("p_brand") === "Brand#13")
      val brandLines = Tables.lineitem(s, d)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_orderkey"))
      Tables.orders(s, d)
        .join(brandLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // Bounded per-group top-k via a typed Aggregator (the UDAF surface):
    // map-side partial top-k buffers instead of a full per-group sort.
    "q51_grouped_topk" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .as[(String, Double, Long)]
      ds.groupByKey(_._1)
        .mapValues(v => (v._2, v._3))
        .agg(graft.functions.TopK.aggregator(3).toColumn)
        .toDF("o_orderpriority", "top")
        .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("rank0", "o_orderkey")))
        .select(col("o_orderpriority"), (col("rank0") + 1).cast("long").as("rank"), col("o_orderkey"))
        .orderBy(col("o_orderpriority"), col("rank"))
    }),

    // Deterministic stratified sampling: hash-bucket each doc (md5 of its
    // id, first 4 hex → bucket 0-99) and keep a per-language rate. This —
    // not rand() — is how a reproducible training-data sample is drawn at
    // scale: the same doc always lands in the same bucket on any cluster,
    // sampling needs no shuffle, and upsampling a stratum is a rate change.
    "q57_stratified_sample" -> ((s, d) => {
      val bucket = T.md5Prefix(col("doc_id").cast("string"), 4) % 100
      val rate = when(col("lang") === "en", 10).otherwise(25)
      Tables.documents(s, d)
        .withColumn("bucket", bucket)
        .filter(col("bucket") < rate)
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy(col("doc_id"))
    }),

    // Domain/source rebalancing (the mixture-weighting pass of a training
    // pipeline): every source is deterministically downsampled to the
    // smallest source's volume. Per-source keep-threshold = n_min·2^16/n_s
    // (integer div, bit-exact on both engines); selection = md5 bucket of
    // the doc id against the threshold — reproducible across clusters and
    // runs, no rand(). The per-source thresholds are an O(sources)
    // broadcast; the corpus pass is map-only + one partial-agg groupBy.
    "q100_balance_sources" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val minN = counts.agg(min(col("n_docs")).as("n_min"))
      val th = counts.crossJoin(broadcast(minN))
        .withColumn("threshold", expr("(n_min * 65536) div n_docs"))
        .select(col("source"), col("n_docs"), col("threshold"))
      val bucket = T.md5Prefix(col("doc_id").cast("string"), 4)
      docs.select(col("source"), bucket.as("bucket"))
        .join(broadcast(th), "source")
        .groupBy(col("source"))
        .agg(min(col("n_docs")).as("n_docs"),
          min(col("threshold")).as("threshold"),
          count(when(col("bucket") < col("threshold"), 1)).as("n_kept"))
        .orderBy(col("source"))
    }),

    // Salted skew join through the correctness gate: lineitem⋈part with
    // every part key spread over 8 salted partitions (deterministic salt
    // from the probe row id, build side replicated 8×). The oracle is the
    // PLAIN join — identical results prove the salting machinery is a pure
    // physical rewrite. This is the manual guard for a hot key too big for
    // AQE's skew splitting.
    "q71_salted_skew_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val pt = Tables.part(s, d).withColumnRenamed("p_partkey", "l_partkey")
      val joined = SkewJoin.saltedJoin(
        li, pt, key = "l_partkey", n = 8,
        disambig = Seq(col("l_orderkey"), col("l_linenumber")))
      joined.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          Exact.moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // Blocked fuzzy match over the DISTINCT value dictionary: dedupe the
    // name column first (the fact table repeats a small dictionary — at any
    // scale you fuzzy-match distinct values, never raw rows), block on the
    // last token, Levenshtein (integer edit distance, identical in both
    // engines) within blocks only. Dictionary pairs then map back to rows
    // by equi-join — the canonical data-cleaning shape.
    "q73_fuzzy_match" -> ((s, d) => {
      val names = Tables.part(s, d).select(col("p_name")).distinct()
        .withColumn("blk", substring_index(col("p_name"), " ", -1))
      val L = names.select(col("blk"), col("p_name").as("name_a"))
      val R = names.select(col("blk"), col("p_name").as("name_b"))
      L.join(R, "blk").filter(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 3)
        .select(col("blk"), col("name_a"), col("name_b"), col("dist"))
        .orderBy(col("blk"), col("name_a"), col("name_b"))
    }),

    // Expectations-style data-quality report (the Delta-constraints /
    // dbt-tests shape): null counts, range violations, duplicate keys, and
    // referential orphans, as one long-form (check, n_bad) relation. The
    // column checks ride ONE pass over each table; the FK check is a
    // left-anti join — nothing row-by-row.
    "q78_data_quality" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val liChecks = li.agg(
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_quantity"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L).otherwise(0L))
          .as("discount_out_of_range"),
        sum(when(col("l_shipdate") < to_timestamp(lit("1992-01-01")), 1L).otherwise(0L))
          .as("shipdate_before_epoch"))
      val oChecks = o.agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("duplicate_orderkeys"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpositive_totalprice"))
      val orphans = li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_lineitems"))
      def melt(df: org.apache.spark.sql.DataFrame) = {
        val cols = df.columns
        df.select(explode(array(cols.toIndexedSeq.map(c =>
          struct(lit(c).as("check_name"), col(c).cast("long").as("n_bad"))): _*)).as("kv"))
          .select(col("kv.check_name").as("check_name"), col("kv.n_bad").as("n_bad"))
      }
      melt(liChecks).unionByName(melt(oChecks)).unionByName(melt(orphans))
        .orderBy(col("check_name"))
    }),

    // Benchmark decontamination: flag training docs sharing any word n-gram
    // with the eval set (the standard n-gram-overlap decontamination check;
    // n=3 here because the synthetic docs are ~60 tokens over a 30-word
    // vocabulary — production corpora use n≈13 for the same precision).
    // The eval set is the ONE relation a hard broadcast() is right for: it
    // is small and fixed BY CONSTRUCTION (a benchmark, not corpus-derived),
    // so the candidate join is a map-side hash probe — the corpus is
    // scanned once, shuffled only to aggregate per-doc hit counts.
    "q88_decontaminate" -> ((s, d) => {
      val dGrams = (df: DataFrame, id: String, text: String) => df.select(
        col(id), explode(graft.plans.TextExpressions.wordShingles(col(text), 3)).as("shingle"))
      val benchGrams = dGrams(s.read.json(Ingest.BenchmarkFixture), "prompt_id", "prompt")
        .select(col("shingle")).distinct()
      dGrams(Tables.documents(s, d), "doc_id", "text")
        .join(broadcast(benchGrams), "shingle")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
        .orderBy(col("doc_id"))
    }),

    // LEAKAGE ACCOUNTING per split: q125's hash split × q88's benchmark
    // 3-gram contamination — "how much of each train/val/test slice
    // touches the eval set", the audit run before any benchmark number
    // is trusted. Composes the two existing primitives (same md5 split,
    // same shingle-overlap flag) so the splits and the contamination
    // definition cannot drift apart; the flagged set broadcasts onto a
    // single corpus pass.
    "q184_split_contamination" -> ((s, d) => {
      val dGrams = (df: DataFrame, id: String, text: String) => df.select(
        col(id), explode(graft.plans.TextExpressions.wordShingles(col(text), 3)).as("shingle"))
      val benchGrams = dGrams(s.read.json(Ingest.BenchmarkFixture), "prompt_id", "prompt")
        .select(col("shingle")).distinct()
      val flagged = dGrams(Tables.documents(s, d), "doc_id", "text")
        .join(broadcast(benchGrams), "shingle")
        .select(col("doc_id")).distinct()
        .withColumn("hit", lit(1L))
      Tables.documents(s, d)
        .withColumn("split", splitOf(col("doc_id")))
        .join(broadcast(flagged), Seq("doc_id"), "left")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"),
          sum(coalesce(col("hit"), lit(0L)) * lit(1000000L))
            .as("hit_ppm_numerator"))
        .withColumn("contam_ppm",
          expr("hit_ppm_numerator div n_docs"))
        .drop("hit_ppm_numerator")
        .orderBy(col("split"))
    }),

    // Deterministic sequence packing: concat-and-chunk docs into fixed
    // token-budget training sequences. Docs are hash-bucketed into 8 shards
    // (same md5 primitive as q57 — reproducible on any cluster) and packed
    // WITHIN each shard by a running token prefix-sum in a deterministic
    // pseudo-random order (the md5 hex doubles as the shuffle order, so
    // packing never needs a global sort): a doc starts the sequence its
    // cumulative offset falls in. Shard-local packing is the 100 TB shape —
    // each shard's window is independent, so the prefix-sum parallelizes
    // across shards instead of serializing on one global ordering.
    "q90_pack_sequences" -> ((s, d) =>
      packedDocs(s, d)
        .withColumn("seq_id", shiftright(col("cum") - col("n_tok"), PackShift))
        .groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("seq_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("shard"), col("seq_id"))),

    // Packing-efficiency audit over q90's concat-and-chunk layout: in
    // this packing there is no intra-sequence padding — the costs are
    // (a) docs STRADDLING a 256-token boundary (truncated context /
    // cross-doc attention unless masked) and (b) the tail stub of each
    // shard. A doc straddles iff its start offset and its last token's
    // offset land in different sequences. Everything is genuinely
    // integer arithmetic over q90's own prefix sums (shared prelude
    // [[packedDocs]]; sequence index = shiftright by log2(budget), exact
    // at ANY prefix-sum magnitude); the fragmentation rate is what
    // decides between concat-and-chunk and best-fit packing in
    // production.
    "q139_packing_audit" -> ((s, d) =>
      packedDocs(s, d)
        .withColumn("split", when(col("n_tok") > 0 &&
          shiftright(col("cum") - col("n_tok"), PackShift) =!=
            shiftright(col("cum") - 1, PackShift), 1L).otherwise(0L))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("split")).as("n_split"),
          sum(col("n_tok")).as("total_tokens"),
          (shiftright(sum(col("n_tok")) - 1, PackShift) + 1).as("n_seqs"))
        .withColumn("tail_waste",
          col("n_seqs") * PackBudget - col("total_tokens"))
        .orderBy(col("shard"))),

    // Length-BUCKETED batching audit — the padding-based alternative to
    // q90's concat-and-chunk (the comparison q139's fragmentation rate
    // exists to inform): each doc pads up to the smallest power-of-two
    // bucket ≥ its token count (16..4096; longer docs truncate to 4096).
    // Per bucket: docs, real tokens, padded tokens, the padding waste
    // that batching same-length docs exists to minimize, and truncation
    // loss at the cap. Pure integer arithmetic over one corpus pass with
    // an 8-way CASE — no shuffle beyond the bucket rollup, hash-exact in
    // both engines.
    "q154_length_buckets" -> ((s, d) => {
      val n = size(graft.plans.TextExpressions.tokens(col("text"))).cast("long")
      val bucket = when(n <= 16, 16L).when(n <= 32, 32L)
        .when(n <= 64, 64L).when(n <= 128, 128L).when(n <= 256, 256L)
        .when(n <= 512, 512L).when(n <= 1024, 1024L).when(n <= 2048, 2048L)
        .otherwise(4096L)
      Tables.documents(s, d)
        .select(bucket.as("bucket"), n.as("n_tok"))
        .withColumn("kept", least(col("n_tok"), lit(4096L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("kept")).as("real_tokens"),
          (first(col("bucket")) * count(lit(1))).as("padded_tokens"),
          sum(col("n_tok") - col("kept")).as("truncated_tokens"))
        .withColumn("pad_waste", col("padded_tokens") - col("real_tokens"))
        .select(col("bucket"), col("n_docs"), col("real_tokens"),
          col("padded_tokens"), col("pad_waste"), col("truncated_tokens"))
        .orderBy(col("bucket"))
    }),

    // Deterministic EPOCH SHUFFLE — the reproducible global training
    // order: rank docs by md5("epoch1:" || doc_id) (new epoch → new
    // seed → fresh order, same seed → bit-identical order on any
    // cluster), then audit the property the shuffle exists for: every
    // rank decile should hold each source in near-corpus proportion
    // (IID mixing, no curriculum accidents). The global rank is
    // TWO-PHASE, never a single-partition window: the md5 value space
    // splits into fixed buckets (value ranges — deterministic, unlike
    // sampled range-partitioner boundaries), each bucket ranks in
    // parallel, and a bounded per-bucket offset join (64 rows at any
    // corpus size) lifts local ranks to global — the distributed-rank
    // shape a shuffled training-data export pays at 100 TB.
    "q156_epoch_shuffle" -> ((s, d) => {
      val n = Tables.documents(s, d).count()
      val Buckets = 64L
      // h ∈ [0, 2^32): 8 hex chars of md5 — fixed equal value ranges
      val hashed = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          T.md5Prefix(concat(lit("epoch1:"), col("doc_id").cast("string")), 8)
            .as("h"))
        .withColumn("bucket", (col("h") / lit(4294967296L / Buckets)).cast("long"))
      val wb = Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))
      val local = hashed.withColumn("lr", row_number().over(wb).cast("long"))
      val wOff = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = local.groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
        .select(col("bucket"), col("off"))
      local.join(broadcast(offsets), "bucket")
        .withColumn("rank", col("off") + col("lr"))
        .withColumn("decile", ((col("rank") - 1) * 10 / n).cast("long"))
        .groupBy(col("decile"), col("source"))
        .agg(count(lit(1)).as("n_docs"), min(col("rank")).as("first_rank"))
        .orderBy(col("decile"), col("source"))
    }),

    // The round-4 curation pipeline end to end, as ONE declarative plan
    // (the q50 analog for the curation family): quality-weighted accept
    // (q132's draw) → verbatim-span-dup drop (q135's window-df rule) →
    // mixture plan computed ON THE SURVIVORS (q134's arithmetic via the
    // shared mixturePlanOf) → salted selection draw (q138's sampler).
    // Every stage reuses the family's single shared definition, and the
    // output audits each stage: survivors, planned and selected tokens
    // per source. Shape at scale: one corpus pass for doc stats + the
    // q135 window-df shuffle for the dup rule + a 20-row plan broadcast
    // — the dup stage is the only corpus-volume shuffle in the whole
    // pipeline.
    "q141_curation_pipeline" -> ((s, d) => {
      // two plan branches (the dup join, the final rollup) read this
      // frame — materialize once per (session, dir) like q50docs (see
      // Dedup.shingleDf). The 8-gram span-dup counts come from the
      // relation q135 ALSO reads (Dedup.spanDupCounts) — the suite's
      // biggest token shuffle materializes once for both queries.
      val docs = graft.sources.RelationCache.of(s, "pipelines.q141docs", d) {
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(graft.plans.TextExpressions.tokens(col("text"))).cast("long").as("n_tok"),
            qualityAccept(col("doc_id"), col("text")).as("q_ok"))
      }
      val dups = Dedup.spanDupCounts(s, d)
        .select(col("doc_id"), col("n_win"), col("n_dup"))
      // drop iff flagged by q135's rule; docs too short to shingle keep
      // their quality verdict (n_win = 0 never flags)
      val surv = docs.join(dups, Seq("doc_id"), "left")
        .withColumn("n_dup", coalesce(col("n_dup"), lit(0L)))
        .filter(col("q_ok") &&
          col("n_dup") * 5 < greatest(coalesce(col("n_win"), lit(0L)), lit(1L)))
      val plan = mixturePlanOf(
          surv.groupBy(col("source")).agg(sum(col("n_tok")).as("avail")))
        .select(col("source"), col("avail"), col("rate"), col("planned"))
      surv.join(broadcast(plan), "source")
        .withColumn("sel",
          (T.md5Prefix(concat(lit("mix:"), col("doc_id").cast("string")), 4)
            < floor(col("rate") * 65536)).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_surv"),
          first(col("avail")).as("surv_tokens"),
          first(col("planned")).as("planned_tokens"),
          sum(col("sel")).as("n_sel"),
          sum(col("sel") * col("n_tok")).as("sel_tokens"))
        .orderBy(col("source"))
    }),

    // The LLM-training-data pipeline, end to end: quality-score filter →
    // near-duplicate removal (keep the lowest doc_id of each dup pair) →
    // per-language corpus stats.
    "q50_training_pipeline" -> ((s, d) => {
      // scored/tokenized corpus feeds 4 plan branches (inv, sizes ×2, final
      // agg) — materialize once per (session, dir) (see Dedup.shingleDf
      // for the rationale and the dir-switch retirement)
      val docs = graft.sources.RelationCache.of(s, "pipelines.q50docs", d) {
        Tables.documents(s, d)
          .withColumn("sh", graft.plans.TextExpressions.wordShingles(col("text"), 3))
          .withColumn("toks", graft.plans.TextExpressions.tokens(col("text")))
          .filter(size(col("toks")) >= 3) // oracle twin excludes shingle-less docs
          .withColumn("quality", graft.plans.TextExpressions.qualityScore(col("text")))
      }
      // near-dup losers: the higher doc_id of every pair with Jaccard >=
      // 0.5 — EXACTLY Dedup's cached 0.5-threshold pair relation (same
      // shingle base: len(toks) >= 3 ⟺ nonempty 3-shingles; same capped
      // packed-pair aggregation; same count-derived Jaccard). Reusing it
      // means q34/q50/q68 share ONE materialization of the pair scan per
      // (session, dir) instead of q50 re-running its own.
      val losers = Dedup.dupPairs(s, d).select(col("b").as("doc_id")).distinct()
      docs.filter(col("quality") >= 0.55)
        .join(losers, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("quality")).as("min_quality"),
          max(col("quality")).as("max_quality"))
        .orderBy(col("lang"))
    }),

    // Deterministic train/val/test split (90/5/5): bucket = first 8 md5
    // hex digits of the doc id mod 100 (the proven cross-engine hash
    // construct, see q57's sampling note). A pure function of the id —
    // stable under reruns, re-partitioning, and table growth, unlike
    // randomSplit — so eval rows can never leak into train between
    // pipeline runs. At 100 TB the split is a map-side derived column
    // (codegen'd md5) with a 3-group partial-aggregated audit; no
    // shuffle carries the corpus.
    // Quality-weighted sampling (the curation pass after scoring):
    // accept a doc iff md5-bucket(id) < floor(quality·2^16) — acceptance
    // PROBABILITY equals the quality score, yet the draw is a pure
    // function of the id (reproducible across clusters and reruns, no
    // rand()). quality·65536 is a power-of-two multiply and the decision
    // compares integers, so accept/reject is bit-identical in both
    // engines. Map-side derived columns + one partial-agg rollup — no
    // corpus shuffle.
    "q132_quality_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("kept", qualityAccept(col("doc_id"), col("text")).cast("long"))
        .withColumn("n_tok",
          size(graft.plans.TextExpressions.tokens(col("text"))).cast("long"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("kept")).as("n_kept"),
          sum(col("kept") * col("n_tok")).as("kept_tokens"))
        .orderBy(col("lang"))
    }),

    // Temperature-sampled domain mixture planner (the τ=2 multilingual
    // standard): per-source target weight ∝ sqrt(available tokens), so
    // small sources are upsampled relative to proportional mixing;
    // sampling rate = min(1, budget·w_s / avail_s), budget = ¼ of the
    // corpus. sqrt IS IEEE-correctly-rounded (unlike ln/exp, q130
    // note), but Σ√ over sources would be an order-dependent double
    // sum — so the weight numerators are FLOORED to BIGINT first:
    // isq = floor(sqrt(avail)), denom = Σ isq is exact, and the rate
    // is a double ratio whose four factors are each cast to double
    // BEFORE multiplying (each BIGINT→DOUBLE cast is exact below 2^53
    // and the products round correctly-rounded identically in both
    // engines), so no 64-bit product can overflow at any corpus size
    // — unlike a BIGINT isq·budget / denom·avail, whose denominator
    // would overflow first at ~6e11 tokens/source. Shape at scale: a
    // word-count
    // partial agg down to one row per source (20 rows out), then
    // arithmetic on that tiny frame; the plan never shuffles the
    // corpus, and applying it is q132's map-side accept test with
    // rate as the threshold.
    "q134_mixture_plan" -> ((s, d) =>
      mixturePlan(s, d)
        .select(col("source"), col("avail"), col("isq"), col("rate"),
          col("planned"), (col("rate") === 1.0).as("saturated"))
        .orderBy(col("source"))),

    // APPLY the q134 plan — the execution half of the mixture loop: each
    // doc draws its deterministic md5 bucket and is kept iff
    // bucket < floor(rate_source·2^16) (q132's accept construct with the
    // per-source planned rate as the threshold). The 20-row plan frame
    // broadcasts onto a single map-side pass over the corpus; the output
    // audits achieved vs planned (achieved counts are binomially
    // distributed around rate·n_docs — the audit columns make the
    // discrepancy measurable, the spec bounds it). At 100 TB this IS the
    // production sampling job: one scan, no shuffle beyond the 20-group
    // rollup.
    "q138_apply_mixture" -> ((s, d) => {
      val plan = mixturePlan(s, d)
        .select(col("source"), col("rate"), col("planned"))
      // 'mix:'-salted draw (the q131 seeded-hash construct): q132's
      // quality accept reads the UNsalted bucket of the same doc_id, and
      // an unsalted draw here would be perfectly correlated with it —
      // chaining curation then mixture would keep min(rate, quality)
      // instead of rate·quality. Distinct salts make the draws
      // independent.
      val accept = (T.md5Prefix(concat(lit("mix:"), col("doc_id").cast("string")), 4)
        < floor(col("rate") * 65536)).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(graft.plans.TextExpressions.tokens(col("text"))).cast("long").as("n_tok"))
        .join(broadcast(plan), "source")
        .withColumn("kept", accept)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("kept")).as("n_kept"),
          sum(col("kept") * col("n_tok")).as("achieved_tokens"),
          first(col("planned")).as("planned_tokens"))
        .orderBy(col("source"))
    }),

    "q125_hash_split" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("split", splitOf(col("doc_id")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(size(graft.plans.TextExpressions.tokens(col("text"))).cast("long"))
            .as("sum_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("split"))
    }),

    // Split-leakage audit — q125's deterministic split crossed with
    // q88's n-gram machinery, turned INWARD: a 5-gram present verbatim
    // in BOTH the train and test splits is eval leakage the doc-level
    // hash split cannot prevent (near-dup docs straddle the boundary;
    // this measures exactly how much). Shape at scale: train grams are
    // distinct'd by the word-count shuffle; the test windows join them
    // ON THE SAME gram partitioning (one exchange each side, no pair
    // relation); everything after is per-doc then per-lang rollup.
    "q136_split_leakage" -> ((s, d) => {
      // the train branch and the test branch each read this frame, and
      // Spark re-evaluates a non-Exchange subtree once per referencing
      // branch — without the cache the corpus is scanned AND re-shingled
      // twice (the single largest avoidable cost in the suite at 100 TB).
      // Materialize the pre-explode (doc, shingle-array) frame once per
      // (session, dir), exactly as q141/q50 do (see Dedup.shingleDf).
      val sh5 = graft.sources.RelationCache.of(s, "pipelines.q136sh5", d) {
        Tables.documents(s, d)
          .withColumn("split", splitOf(col("doc_id")))
          .select(col("doc_id"), col("lang"), col("split"),
            graft.plans.TextExpressions.wordShingles(col("text"), 5).as("sh"))
      }
      val win = sh5.select(col("doc_id"), col("lang"), col("split"),
        explode(col("sh")).as("w"))
      val trainGrams = win.filter(col("split") === "train")
        .select(col("w")).distinct().withColumn("hit", lit(1L))
      win.filter(col("split") === "test")
        .join(trainGrams, Seq("w"), "left")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_win"),
          sum(coalesce(col("hit"), lit(0L))).as("n_leak"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_test_docs"),
          sum(when(col("n_leak") > 0, 1L).otherwise(0L)).as("n_contam"),
          sum(col("n_leak")).as("leaked_windows"),
          sum(col("n_win")).as("test_windows"))
        .orderBy(col("lang"))
    }))

  /** Deterministic quality-accept predicate, the ONE definition shared by
    * batch q132, the streaming sampler (Streams.qualitySampleStream), and
    * the stream≡batch equality spec: accept iff md5-bucket(doc_id) <
    * floor(quality·2^16). Empty docs (0 tokens — quality is 0/0 = NaN)
    * are rejected EXPLICITLY rather than via NaN comparison semantics,
    * which differ between engines (DuckDB's floor-cast of NaN errors). */
  def qualityAccept(docId: Column, text: Column): Column =
    (size(graft.plans.TextExpressions.tokens(text)) > 0) &&
      (T.md5Prefix(docId.cast("string"), 4)
        < floor(graft.plans.TextExpressions.qualityScore(text) * 65536))

  /** The τ=2 mixture plan (one row per source: avail, isq, rate, planned)
    * — ONE definition shared by q134 (the plan) and q138 (its
    * application), so the sampler can never run a different plan than the
    * one audited. The avail frame is RelationCache'd: the budget/denom
    * rollup and the final join read it without re-scanning the corpus. */
  private def mixturePlan(s: SparkSession, d: String): DataFrame =
    mixturePlanOf(graft.sources.RelationCache.of(s, "pipelines.q134avail", d) {
      Tables.documents(s, d)
        .select(col("source"),
          size(graft.plans.TextExpressions.tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("source"))
        .agg(sum(col("n_tok")).as("avail"))
    })

  /** The plan arithmetic over ANY (source, avail) frame — q134/q138 run
    * it on the raw corpus, q141 on the curation survivors. */
  private def mixturePlanOf(avail: DataFrame): DataFrame = {
    val w = avail
      .withColumn("isq", floor(sqrt(col("avail").cast("double"))).cast("long"))
    val tot = w.agg(sum(col("isq")).as("denom"),
      floor(sum(col("avail")) / 4).cast("long").as("budget"))
    w.crossJoin(broadcast(tot))
      .withColumn("rate", least(lit(1.0),
        (col("isq").cast("double") * col("budget").cast("double"))
          / (col("denom").cast("double") * col("avail").cast("double"))))
      .withColumn("planned",
        floor(col("rate") * col("avail").cast("double")).cast("long"))
  }

  /** Sequence-packing token budget (and its log2 for integer divides). */
  private[graft] val PackBudget = 256L
  private val PackShift = 8

  /** q90's packing prelude — (doc_id, n_tok, h, shard, cum): docs
    * hash-bucketed into 8 shards, deterministic md5 order within each
    * shard, running token prefix-sum. ONE definition shared by q90 (the
    * packer) and q139 (its audit), like [[mixturePlan]]: the audit can
    * never measure a different packing than the one q90 produces.
    * Sequence indices derive via shiftright(·, PackShift) — genuinely
    * integer, exact at any prefix-sum magnitude (a double floor-divide
    * loses exactness past 2^53). */
  private def packedDocs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(graft.plans.TextExpressions.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("shard", conv(substring(col("h"), 1, 2), 16, 10).cast("long") % 8)
      .withColumn("cum", sum(col("n_tok")).over(w))
  }

  /** q125's deterministic 90/5/5 split — shared with q136 so the leakage
    * audit can never drift from the split it audits. */
  def splitOf(docId: Column): Column = {
    val bucket = T.md5Prefix(docId.cast("string"), 8) % 100
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
  }

  /** SQL twin of [[mixturePlan]] — the CTE chain ending in `plan`
    * (source, avail, isq, rate, planned), shared by the q134 and q138
    * twins exactly as the Scala helper is shared by the queries. */
  /** Mixture-plan arithmetic CTEs over any (source, avail) CTE — the SQL
    * twin of [[mixturePlanOf]]. */
  private def sqlMixtureFrom(availCte: String): String =
    s"""w AS (SELECT source, avail,
                CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT) AS isq
              FROM $availCte),
        t AS (SELECT CAST(sum(isq) AS BIGINT) AS denom,
                CAST(floor(CAST(sum(avail) AS DOUBLE) / 4) AS BIGINT) AS budget
              FROM w),
        plan AS (SELECT source, avail, isq, rate,
                   CAST(floor(rate * CAST(avail AS DOUBLE)) AS BIGINT) AS planned
                 FROM (SELECT source, avail, isq,
                         least(1.0, (CAST(isq AS DOUBLE) * CAST(budget AS DOUBLE))
                           / (CAST(denom AS DOUBLE) * CAST(avail AS DOUBLE))) AS rate
                       FROM w, t))"""

  private lazy val sqlMixtureCtes =
    s"""avail AS (SELECT source,
              CAST(sum(CAST(len(toks) AS BIGINT)) AS BIGINT) AS avail
            FROM (SELECT source, ${T.sqlToks} AS toks FROM documents)
            GROUP BY source),
        ${sqlMixtureFrom("avail")}"""

  /** SQL twin of [[packedDocs]] (CTE `packed`), shared by the q90 and
    * q139 twins. */
  private lazy val sqlPackedCte =
    s"""packed AS (
          SELECT doc_id, n_tok, shard,
            sum(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM (SELECT doc_id,
                  CAST(len(${T.sqlToks}) AS BIGINT) AS n_tok,
                  md5(CAST(doc_id AS VARCHAR)) AS h,
                  ${T.sqlMd5Prefix("CAST(doc_id AS VARCHAR)", 2)} % 8 AS shard
                FROM documents))"""

  /** SQL twin of [[splitOf]] over a relation exposing doc_id (expects the
    * md5 bucket pre-computed as column `b`) — ONE definition for the q125
    * and q136 twins, mirroring the shared Scala derivation. */
  private val sqlSplitBucket =
    s"""${T.sqlMd5Prefix("CAST(doc_id AS VARCHAR)", 8)} % 100"""
  private val sqlSplitCase =
    """CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END"""

  private val toksSql = T.sqlToks
  private val shSql =
    """SELECT doc_id, lang, n_chars, toks,
        list_distinct([list_aggr(toks[i:i+2], 'string_agg', ' ')
          FOR i IN range(1, len(toks) - 1)]) AS sh
       FROM (SELECT doc_id, lang, n_chars, """ + toksSql + """ AS toks
             FROM documents) WHERE len(toks) >= 3"""
  private val qualitySql =
    """0.5 * (1.0 - CAST(len(list_filter(toks, t -> t IN ('a','the','of','and','to','in'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
       + 0.5 * least(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) / 8.0, 1.0)"""

  /** Shared oracle prelude for the NB family (q174/q178): hashed
    * features → class-conditional counts → the fixed-point log CTE →
    * per-doc integer margins, ending in `m(doc_id, lang, m)`. */
  private lazy val nbSqlCtes: String =
    s"""feat AS (
          SELECT doc_id, lang,
            ${T.sqlMd5Prefix("feat", 8)} % $DsirBuckets AS b,
            CAST(count(*) AS BIGINT) AS n
          FROM (SELECT doc_id, lang, unnest(list_concat(toks,
                  [toks[i] || ' ' || toks[i + 1] FOR i IN range(1, len(toks))])) AS feat
                FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents))
          GROUP BY 1, 2, 3),
        cnt AS (SELECT b,
                  CAST(sum(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT) AS t,
                  CAST(sum(CASE WHEN lang <> 'en' THEN n ELSE 0 END) AS BIGINT) AS sc
                FROM feat GROUP BY b),
        tot AS (SELECT CAST(sum(t) AS BIGINT) AS tt,
                  CAST(sum(sc) AS BIGINT) AS st FROM cnt),
        vals AS (SELECT b AS v, (t + 1) * (st + $DsirBuckets) AS num,
                   (sc + 1) * (tt + $DsirBuckets) AS den
                 FROM cnt, tot),
        ${T.sqlIlog2Ctes("nb", "vals", "v")},
        m AS (SELECT doc_id, lang, CAST(sum(n * wt) AS BIGINT) AS m
              FROM feat JOIN nbwts w ON feat.b = w.v GROUP BY 1, 2)"""

  def oracle: Map[String, String] = Map(
    // class-conditional counts -> the shared fixed-point log CTE ->
    // integer margins; the same 12 shift-and-square steps as the Scala
    // side's ilog2Fp
    "q174_nb_classifier" ->
      s"""WITH $nbSqlCtes
          SELECT lang, count(*) AS n_docs,
            CAST(sum(CASE WHEN (m > 0) = (lang = 'en') THEN 1 ELSE 0 END)
              AS BIGINT) AS n_correct
          FROM m GROUP BY lang ORDER BY lang""",

    // the same margin CTE chain, re-bucketed: bin width derives from the
    // corpus max |margin| exactly as the Scala side computes it
    "q178_nb_calibration" ->
      s"""WITH $nbSqlCtes,
          mx AS (SELECT CAST(max(abs(m)) AS BIGINT) AS mx FROM m),
          bins AS (SELECT lang, (m * 5) // ((SELECT mx FROM mx) + 1) AS bin
                   FROM m)
          SELECT bin, count(*) AS n_docs,
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
              AS n_en,
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000
              // count(*) AS BIGINT) AS en_frac_micro
          FROM bins GROUP BY bin ORDER BY bin""",

    // the same 12 shift-and-square steps as ilog2Fp, via the shared CTE
    // generator (TextFunctions.sqlIlog2Ctes)
    "q160_dsir_select" ->
      s"""WITH feat AS (
            SELECT doc_id, lang, source,
              ${T.sqlMd5Prefix("feat", 8)} % $DsirBuckets AS b,
              CAST(count(*) AS BIGINT) AS n
            FROM (SELECT doc_id, lang, source, unnest(list_concat(toks,
                    [toks[i] || ' ' || toks[i + 1] FOR i IN range(1, len(toks))])) AS feat
                  FROM (SELECT doc_id, lang, source, $toksSql AS toks FROM documents))
            GROUP BY 1, 2, 3, 4),
          cnt AS (SELECT b,
                    CAST(sum(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT) AS t,
                    CAST(sum(n) AS BIGINT) AS s0
                  FROM feat GROUP BY b),
          tot AS (SELECT CAST(sum(t) AS BIGINT) AS tt,
                    CAST(sum(s0) AS BIGINT) AS st FROM cnt),
          frac AS (SELECT b, (t + 1) * (st + $DsirBuckets) AS num,
                     (s0 + 1) * (tt + $DsirBuckets) AS den
                   FROM cnt, tot),
          ${T.sqlIlog2Ctes("dsir", "frac", "b")},
          scores AS (SELECT doc_id, source, CAST(sum(n * wt) AS BIGINT) AS score
                     FROM feat JOIN dsirwts USING (b) GROUP BY doc_id, source),
          picked AS (SELECT * FROM scores ORDER BY score DESC, doc_id LIMIT 100),
          sel AS (SELECT source, count(*) AS n_selected,
                    CAST(sum(score) AS BIGINT) AS sel_score
                  FROM picked GROUP BY source),
          pool AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
          SELECT pool.source, n_docs,
            CAST(COALESCE(n_selected, 0) AS BIGINT) AS n_selected,
            CAST(COALESCE(sel_score, 0) AS BIGINT) AS sel_score
          FROM pool LEFT JOIN sel USING (source) ORDER BY source""",

    // q68's recursive-CTE twin wrapped as a subquery, then the same
    // integer arithmetic — the oracle can never diverge from q68's
    // definition of a duplicate either
    "q152_effective_corpus" ->
      s"""WITH clusters AS (${Dedup.oracle("q68_dup_clusters")}),
          excess AS (
            SELECT d.lang, CAST(sum(c.n_members - 1) AS BIGINT) AS dup_excess
            FROM clusters c JOIN documents d ON c.cluster_rep = d.doc_id
            GROUP BY d.lang)
          SELECT d.lang, count(*) AS n_docs,
            CAST(coalesce(e.dup_excess, 0) AS BIGINT) AS dup_excess,
            CAST(count(*) - coalesce(e.dup_excess, 0) AS BIGINT) AS n_effective
          FROM documents d LEFT JOIN excess e ON d.lang = e.lang
          GROUP BY d.lang, e.dup_excess ORDER BY d.lang""",

    "q147_token_budget" ->
      s"""WITH scored AS (
            SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
              $qualitySql AS score
            FROM (SELECT doc_id, source, $toksSql AS toks FROM documents)),
          cum AS (
            SELECT source, n_tokens, score,
              sum(n_tokens) OVER (PARTITION BY source
                ORDER BY score DESC, doc_id) AS cum
            FROM scored)
          SELECT source, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS tokens_used,
            min(score) AS frontier_score
          FROM cum WHERE cum <= $TokenBudgetPerSource
          GROUP BY source ORDER BY source""",

    "q46_grouped_string_agg" ->
      """SELECT lang, string_agg(source, ',' ORDER BY rn) AS top_sources FROM (
           SELECT lang, source,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, source) AS rn
           FROM (SELECT lang, source, count(*) AS n FROM documents
                 GROUP BY lang, source))
         WHERE rn <= 3 GROUP BY lang ORDER BY lang""",

    "q47_above_segment_avg" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal, seg_avg FROM (
           SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) OVER w AS DOUBLE)
               / count(*) OVER w AS seg_avg
           FROM customer WINDOW w AS (PARTITION BY c_mktsegment))
         WHERE c_acctbal > seg_avg * 1.5 ORDER BY c_custkey""",

    "q48_two_hop_semi" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem JOIN part ON l_partkey = p_partkey
                       WHERE l_orderkey = o_orderkey AND p_brand = 'Brand#13')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q51_grouped_topk" ->
      """SELECT o_orderpriority, rank, o_orderkey FROM (
           SELECT o_orderpriority, o_orderkey,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rank
           FROM orders) WHERE rank <= 3
         ORDER BY o_orderpriority, rank""",

    "q78_data_quality" ->
      """SELECT check_name, n_bad FROM (
           SELECT 'null_quantity' AS check_name,
             CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
           FROM lineitem
           UNION ALL
           SELECT 'discount_out_of_range',
             CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'shipdate_before_epoch',
             CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01' THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'duplicate_orderkeys',
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
           UNION ALL
           SELECT 'nonpositive_totalprice',
             CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
           UNION ALL
           SELECT 'orphan_lineitems',
             CAST(count(*) AS BIGINT) FROM lineitem
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
         ORDER BY check_name""",

    "q71_salted_skew_join" ->
      s"""SELECT p_brand, count(*) AS n_lines,
          ${Exact.sqlMoneySum("l_extendedprice")} AS sum_price
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand ORDER BY p_brand""",

    "q73_fuzzy_match" ->
      """SELECT blk, name_a, name_b, dist FROM (
           SELECT x.blk, x.p_name AS name_a, y.p_name AS name_b,
             levenshtein(x.p_name, y.p_name) AS dist
           FROM (SELECT DISTINCT p_name, split_part(p_name, ' ', -1) AS blk FROM part) x
           JOIN (SELECT DISTINCT p_name, split_part(p_name, ' ', -1) AS blk FROM part) y
             ON x.blk = y.blk AND x.p_name < y.p_name)
         WHERE dist <= 3
         ORDER BY blk, name_a, name_b""",

    "q57_stratified_sample" ->
      s"""SELECT doc_id, lang, bucket FROM (
           SELECT doc_id, lang,
             ${T.sqlMd5Prefix("CAST(doc_id AS VARCHAR)", 4)} % 100 AS bucket
           FROM documents)
         WHERE bucket < (CASE WHEN lang = 'en' THEN 10 ELSE 25 END)
         ORDER BY doc_id""",

    "q100_balance_sources" ->
      s"""WITH counts AS (
           SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
         th AS (
           SELECT source, n_docs,
             (SELECT min(n_docs) FROM counts) * 65536 // n_docs AS threshold
           FROM counts)
         SELECT d.source, min(t.n_docs) AS n_docs, min(t.threshold) AS threshold,
           CAST(count(*) FILTER (WHERE
             ${T.sqlMd5Prefix("CAST(doc_id AS VARCHAR)", 4)} < t.threshold)
             AS BIGINT) AS n_kept
         FROM documents d JOIN th t USING (source)
         GROUP BY d.source ORDER BY d.source""",

    "q88_decontaminate" ->
      s"""WITH bench AS (SELECT prompt AS text FROM read_json('${Ingest.BenchmarkFixture}',
              format = 'newline_delimited',
              columns = {prompt_id: 'BIGINT', prompt: 'VARCHAR'})),
          bg AS (SELECT DISTINCT unnest(sh) AS shingle FROM (
              SELECT list_distinct([list_aggr(toks[i:i+2], 'string_agg', ' ')
                  FOR i IN range(1, len(toks) - 1)]) AS sh
              FROM (SELECT $toksSql AS toks FROM bench)
              WHERE len(toks) >= 3)),
          dg AS (SELECT doc_id, unnest(sh) AS shingle FROM (
              SELECT doc_id, list_distinct([list_aggr(toks[i:i+2], 'string_agg', ' ')
                  FOR i IN range(1, len(toks) - 1)]) AS sh
              FROM (SELECT doc_id, $toksSql AS toks FROM documents)
              WHERE len(toks) >= 3))
          SELECT doc_id, count(*) AS n_hits FROM dg JOIN bg USING (shingle)
          GROUP BY doc_id ORDER BY doc_id""",

    "q184_split_contamination" ->
      s"""WITH bench AS (SELECT prompt AS text FROM read_json('${Ingest.BenchmarkFixture}',
              format = 'newline_delimited',
              columns = {prompt_id: 'BIGINT', prompt: 'VARCHAR'})),
          bg AS (SELECT DISTINCT unnest(sh) AS shingle FROM (
              SELECT list_distinct([list_aggr(toks[i:i+2], 'string_agg', ' ')
                  FOR i IN range(1, len(toks) - 1)]) AS sh
              FROM (SELECT $toksSql AS toks FROM bench)
              WHERE len(toks) >= 3)),
          dg AS (SELECT doc_id, unnest(sh) AS shingle FROM (
              SELECT doc_id, list_distinct([list_aggr(toks[i:i+2], 'string_agg', ' ')
                  FOR i IN range(1, len(toks) - 1)]) AS sh
              FROM (SELECT doc_id, $toksSql AS toks FROM documents)
              WHERE len(toks) >= 3)),
          flagged AS (SELECT DISTINCT doc_id FROM dg JOIN bg USING (shingle)),
          sp AS (SELECT doc_id, $sqlSplitCase AS split
                 FROM (SELECT doc_id, $sqlSplitBucket AS b FROM documents))
          SELECT sp.split, count(*) AS n_docs,
            CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_contaminated,
            CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1000000 ELSE 0 END)
              // count(*) AS BIGINT) AS contam_ppm
          FROM sp LEFT JOIN flagged f USING (doc_id)
          GROUP BY sp.split ORDER BY sp.split""",

    "q90_pack_sequences" ->
      s"""WITH $sqlPackedCte
         SELECT shard, seq_id, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS seq_tokens, min(doc_id) AS first_doc
         FROM (SELECT doc_id, n_tok, shard,
                 CAST((cum - n_tok) // $PackBudget AS BIGINT) AS seq_id
               FROM packed)
         GROUP BY shard, seq_id ORDER BY shard, seq_id""",

    "q139_packing_audit" ->
      s"""WITH $sqlPackedCte
          SELECT shard, count(*) AS n_docs,
            CAST(sum(split) AS BIGINT) AS n_split,
            CAST(sum(n_tok) AS BIGINT) AS total_tokens,
            CAST((sum(n_tok) - 1) // $PackBudget + 1 AS BIGINT) AS n_seqs,
            CAST(((sum(n_tok) - 1) // $PackBudget + 1) * $PackBudget
                 - sum(n_tok) AS BIGINT) AS tail_waste
          FROM (
            SELECT shard, n_tok,
              CASE WHEN n_tok > 0 AND
                (cum - n_tok) // $PackBudget <> (cum - 1) // $PackBudget
                THEN 1 ELSE 0 END AS split
            FROM packed)
          GROUP BY shard ORDER BY shard""",

    "q156_epoch_shuffle" ->
      s"""SELECT CAST((rank - 1) * 10 // (SELECT count(*) FROM documents)
              AS BIGINT) AS decile,
            source, count(*) AS n_docs,
            CAST(min(rank) AS BIGINT) AS first_rank
          FROM (
            SELECT source,
              CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS rank
            FROM (SELECT doc_id, source,
                    ${T.sqlMd5Prefix("'epoch1:' || CAST(doc_id AS VARCHAR)", 8)} AS h
                  FROM documents))
          GROUP BY decile, source ORDER BY decile, source""",

    "q154_length_buckets" ->
      s"""SELECT bucket, count(*) AS n_docs,
            CAST(sum(kept) AS BIGINT) AS real_tokens,
            CAST(bucket * count(*) AS BIGINT) AS padded_tokens,
            CAST(bucket * count(*) - sum(kept) AS BIGINT) AS pad_waste,
            CAST(sum(n_tok - kept) AS BIGINT) AS truncated_tokens
          FROM (
            SELECT CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
                     WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128
                     WHEN n_tok <= 256 THEN 256 WHEN n_tok <= 512 THEN 512
                     WHEN n_tok <= 1024 THEN 1024 WHEN n_tok <= 2048 THEN 2048
                     ELSE 4096 END AS bucket,
              n_tok, least(n_tok, 4096) AS kept
            FROM (SELECT CAST(len(${T.sqlToks}) AS BIGINT) AS n_tok
                  FROM documents))
          GROUP BY bucket ORDER BY bucket""",

    "q141_curation_pipeline" ->
      s"""WITH docs AS (
            SELECT doc_id, source, toks,
              list_distinct([list_aggr(toks[i:i+7], 'string_agg', ' ')
                FOR i IN range(1, len(toks) - 6)]) AS sh,
              CAST(len(toks) AS BIGINT) AS n_tok,
              (len(toks) > 0 AND
                ${T.sqlMd5Prefix("CAST(doc_id AS VARCHAR)", 4)}
                  < CAST(floor(($qualitySql) * 65536) AS BIGINT)) AS q_ok
            FROM (SELECT doc_id, source, $toksSql AS toks FROM documents)),
          win AS (SELECT doc_id, unnest(sh) AS w FROM docs),
          sharedw AS (SELECT w FROM win GROUP BY w HAVING count(*) >= 2),
          dups AS (SELECT doc_id, count(*) AS n_dup
                   FROM win JOIN sharedw USING (w) GROUP BY doc_id),
          surv AS (SELECT d.doc_id, d.source, d.n_tok
                   FROM docs d LEFT JOIN dups USING (doc_id)
                   WHERE d.q_ok AND coalesce(n_dup, 0) * 5
                     < greatest(len(d.sh), 1)),
          avail AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS avail
                    FROM surv GROUP BY source),
          ${sqlMixtureFrom("avail")},
          k AS (SELECT s.source, n_tok, avail, planned,
                  CASE WHEN ${T.sqlMd5Prefix("'mix:' || CAST(doc_id AS VARCHAR)", 4)}
                       < CAST(floor(rate * 65536) AS BIGINT)
                       THEN 1 ELSE 0 END AS sel
                FROM surv s JOIN plan USING (source))
          SELECT source, count(*) AS n_surv,
            CAST(min(avail) AS BIGINT) AS surv_tokens,
            CAST(min(planned) AS BIGINT) AS planned_tokens,
            CAST(sum(sel) AS BIGINT) AS n_sel,
            CAST(sum(sel * n_tok) AS BIGINT) AS sel_tokens
          FROM k GROUP BY source ORDER BY source""",

    "q50_training_pipeline" ->
      s"""WITH docs AS (SELECT doc_id, lang, n_chars, toks, sh, $qualitySql AS quality
            FROM ($shSql)),
          inv AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
          cinv AS (SELECT inv.doc_id, inv.shingle FROM inv
                   JOIN (SELECT shingle FROM inv GROUP BY shingle
                         HAVING count(*) < ${Dedup.StopShingleCap}) ok USING (shingle)),
          losers AS (
            SELECT DISTINCT b AS doc_id FROM (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
              FROM cinv x JOIN cinv y
                ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id) p
            JOIN (SELECT doc_id, len(sh) AS na FROM docs) sa ON p.a = sa.doc_id
            JOIN (SELECT doc_id, len(sh) AS nb FROM docs) sb ON p.b = sb.doc_id
            WHERE CAST(shared AS DOUBLE) / (na + nb - shared) >= 0.5)
          SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
            min(quality) AS min_quality, max(quality) AS max_quality
          FROM docs
          WHERE quality >= 0.55
            AND NOT EXISTS (SELECT 1 FROM losers WHERE losers.doc_id = docs.doc_id)
          GROUP BY lang ORDER BY lang""",

    "q132_quality_sample" ->
      s"""SELECT lang, count(*) AS n_docs,
            CAST(sum(kept) AS BIGINT) AS n_kept,
            CAST(sum(kept * n_tok) AS BIGINT) AS kept_tokens
          FROM (SELECT lang,
                  CASE WHEN len(toks) = 0 THEN 0
                       WHEN ${T.sqlMd5Prefix("CAST(doc_id AS VARCHAR)", 4)}
                       < CAST(floor(($qualitySql) * 65536) AS BIGINT)
                       THEN 1 ELSE 0 END AS kept,
                  CAST(len(toks) AS BIGINT) AS n_tok
                FROM (SELECT lang, doc_id, $toksSql AS toks FROM documents))
          GROUP BY lang ORDER BY lang""",

    "q134_mixture_plan" ->
      s"""WITH $sqlMixtureCtes
          SELECT source, avail, isq, rate, planned, rate = 1.0 AS saturated
          FROM plan ORDER BY source""",

    "q138_apply_mixture" ->
      s"""WITH $sqlMixtureCtes,
          docs AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tok
                   FROM (SELECT doc_id, source, $toksSql AS toks FROM documents)),
          k AS (SELECT d.source,
                  CASE WHEN ${T.sqlMd5Prefix("'mix:' || CAST(doc_id AS VARCHAR)", 4)}
                       < CAST(floor(rate * 65536) AS BIGINT)
                       THEN 1 ELSE 0 END AS kept,
                  n_tok, planned
                FROM docs d JOIN plan USING (source))
          SELECT source, count(*) AS n_docs,
            CAST(sum(kept) AS BIGINT) AS n_kept,
            CAST(sum(kept * n_tok) AS BIGINT) AS achieved_tokens,
            CAST(min(planned) AS BIGINT) AS planned_tokens
          FROM k GROUP BY source ORDER BY source""",

    "q125_hash_split" ->
      s"""SELECT split, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS sum_chars,
            CAST(sum(len($toksSql)) AS BIGINT) AS sum_tokens,
            count(DISTINCT lang) AS n_langs,
            count(DISTINCT source) AS n_sources
          FROM (SELECT *, $sqlSplitCase AS split
                FROM (SELECT *, $sqlSplitBucket AS b FROM documents))
          GROUP BY split ORDER BY split""",

    "q136_split_leakage" ->
      s"""WITH base AS (SELECT doc_id, lang, toks, $sqlSplitCase AS split
                FROM (SELECT doc_id, lang, $toksSql AS toks,
                        $sqlSplitBucket AS b
                      FROM documents)),
          win AS (SELECT doc_id, lang, split,
                    unnest(list_distinct([list_aggr(toks[i:i+4], 'string_agg', ' ')
                      FOR i IN range(1, len(toks) - 3)])) AS w
                  FROM base WHERE len(toks) >= 5),
          tg AS (SELECT DISTINCT w FROM win WHERE split = 'train'),
          per AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_win,
                    CAST(sum(CASE WHEN tg.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_leak
                  FROM (SELECT * FROM win WHERE split = 'test') t
                  LEFT JOIN tg ON t.w = tg.w
                  GROUP BY doc_id, lang)
          SELECT lang, count(*) AS n_test_docs,
            CAST(sum(CASE WHEN n_leak > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contam,
            CAST(sum(n_leak) AS BIGINT) AS leaked_windows,
            CAST(sum(n_win) AS BIGINT) AS test_windows
          FROM per GROUP BY lang ORDER BY lang""")
}
