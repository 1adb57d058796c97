package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Exact, TextFunctions => T}
import graft.sources.Tables

/** Text-analysis operators over `documents` (north-star mandate; generalizes
  * the reference's string handling, SURVEY.md §2.1 ops #12-16).
  *
  * Everything is built-in expressions (split/explode/groupBy/regexp) —
  * whole-stage codegen, map-side partial aggregation, no UDFs. At 100 TB the
  * explode→groupBy(token) shuffle is the classic word-count shape: partial
  * counts collapse each partition's tokens to vocab-size before the exchange,
  * so the shuffle is O(vocab × partitions), not O(tokens).
  */
object TextAnalysis {

  /** q169 flag threshold: a doc whose mean per-bigram cross-entropy under
    * the corpus bigram LM exceeds this (in 1/4096-bit units; 24576 = 6
    * bits/bigram) is "out of distribution" — the CCNet-style perplexity
    * filter signal. Shared with the oracle twin via interpolation. */
  private val HighCeMicro = 24576L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bigram-LM CROSS-ENTROPY scoring (the CCNet perplexity filter,
    // Wenzek et al. 2020, public — theirs uses a wiki KenLM; ours trains
    // the bigram LM on the corpus itself, which is the self-perplexity
    // variant used for repetition/outlier mining). Per doc:
    // CE = Σ_occurrences −log2 p(w2|w1), p = c(w1w2)/c(w1·), reported as
    // the mean per-bigram cost in fixed-point micro-bits. EXACT in both
    // engines because each −log2 term is a DIFFERENCE OF VALUE-KEYED
    // integer logs (ilog2Fp, the q166 recipe): the log table is computed
    // on the driver for the DISTINCT corpus count values only (a few
    // hundred integers at any corpus size) and broadcast. Shape at
    // scale: the LM is the bigram word-count shuffle (partial counts
    // collapse each partition to bigram-vocab size); context counts ride
    // a second vocab-sized rollup; the doc-side join is per-doc bigram
    // GROUPS (not occurrences) against the LM on the bigram key — the
    // only corpus-sized exchange is the word-count shape itself. Docs
    // with < 2 tokens have no bigrams and are excluded (explicitly, both
    // engines — the q132 empty-doc rule).
    "q169_bigram_lm" -> ((s, d) => {
      import s.implicits._
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(graft.plans.TextExpressions.adjacentPairs(col("text"))).as("bg"))
      // the LM is a TRAINED ARTIFACT: one materialization per (session,
      // corpus) — repeat scoring passes (and the bench) pay the doc-side
      // join, not a retrain (the kmeans/PQ index convention)
      val nll = graft.sources.RelationCache.of(s, "text.bigramLm", d) {
        val lm = bg.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
          .withColumn("w1", substring_index(col("bg"), " ", 1))
        val ctx = lm.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
        // the value-keyed log table is built DISTRIBUTED: the compiled
        // ilog2Fp expression maps the distinct count values in place (a
        // few hundred rows at any corpus size — the distinct-count
        // relation, not the corpus) and broadcast-joins back; no
        // collect(), nothing driver-sized anywhere in the lineage
        val wdf = lm.select(col("c12").as("v"))
          .union(ctx.select(col("c1").as("v"))).distinct()
          .select(col("v"), graft.plans.TextExpressions.ilog2Fp(col("v")).as("w"))
        lm.join(ctx, "w1")
          .join(broadcast(wdf).select(col("v").as("c12"), col("w").as("w12")), "c12")
          .join(broadcast(wdf).select(col("v").as("c1"), col("w").as("w1l")), "c1")
          .select(col("bg"), (col("w1l") - col("w12")).as("nll"))
      }
      bg.groupBy(col("doc_id"), col("lang"), col("bg"))
        .agg(count(lit(1)).as("k"))
        .join(nll, "bg")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("k") * col("nll")).as("ce"), sum(col("k")).as("nbg"))
        .select(col("lang"), expr("ce div nbg").as("bpt"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("bpt")).as("sum_ce_micro"),
          sum(when(col("bpt") > HighCeMicro, 1L).otherwise(0L)).as("n_flagged"))
        .orderBy(col("lang"))
    }),
    // GOPHER-STYLE REPETITION SIGNALS, doc-local and integer-exact:
    // the rule-based repetition filters every LLM curation pipeline
    // runs (top-n-gram coverage, duplicate-n-gram fraction) as ONE
    // compiled single-pass expression per document — no corpus-wide
    // (doc, gram) shuffle (the q166 entropy lesson), so the plan is a
    // scan feeding a sort, and the fractions downstream thresholds
    // need stay exact rationals (numerator/denominator BIGINTs)
    "q216_repetition_signals" -> ((s, d) => {
      val r = graft.plans.TextExpressions.repetitionStats(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), r.as("r"))
        .select(col("doc_id"),
          col("r").getItem(0).as("n_tokens"),
          col("r").getItem(1).as("top2_cov"),
          col("r").getItem(2).as("dup3_occ"),
          col("r").getItem(3).as("n3"),
          (col("r").getItem(2) > 0L).as("repetitive"))
        .orderBy(col("doc_id"))
    }),

    // Per-doc SHANNON ENTROPY of the unigram distribution — the lexical-
    // diversity quality signal (low entropy = repetitive/templated text;
    // keyword-stuffed spam scores near 0) the suite previously could not
    // oracle because H needs log2. With the fixed-point integer log2
    // (TextFunctions.ilog2Fp, the q160 primitive) it is EXACT:
    // n·H = n·w(n) − Σ_t c_t·w(c_t) in 1/4096-bit units, every term an
    // integer. Flag threshold: < 3 bits (12288 micro). The whole
    // computation is ONE doc-local compiled expression
    // (TextExpressions.DocEntropy — the same ilog2Fp arithmetic the
    // oracle unrolls, evaluated where the tokens already are): within-
    // doc counting never needed a corpus-wide (doc, token) shuffle, so
    // the plan is a scan feeding a 5-row partial-agg rollup — zero
    // corpus-sized exchanges. (The first version paid the word-count
    // shuffle plus value-keyed broadcast log-table joins; bit-identical
    // output, ~6× the cost.)
    "q166_token_entropy" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"),
          graft.plans.TextExpressions.docEntropy(col("text")).as("ent"))
        .filter(col("ent") >= 0L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ent")).as("sum_entropy_micro"),
          sum(when(col("ent") < 12288L, 1L).otherwise(0L)).as("n_lowent"))
        .orderBy(col("lang"))
    }),
    // Token frequencies: corpus-wide counts + document frequencies.
    "q25_word_counts" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.plans.TextExpressions.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(desc("n"), col("token"))
    }),

    // Per-language corpus stats (exact integer-sum averages).
    "q26_lang_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("n_tokens", size(graft.plans.TextExpressions.tokens(col("text"))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          Exact.intAvg(col("n_chars")).as("avg_chars"),
          Exact.intAvg(col("n_tokens")).as("avg_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    }),

    // Quality scoring: stopword ratio + token-length heuristic, top-100.
    "q27_quality_score" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(graft.plans.TextExpressions.tokens(col("text"))).cast("long").as("n_tokens"),
          graft.plans.TextExpressions.qualityScore(col("text")).as("score"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(100)
    }),

    // BPE-ish regex token counting, rolled up per language.
    "q28_token_counts" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("n_rtok", T.regexTokenCount(col("text")))
        .groupBy(col("lang"))
        .agg(sum(col("n_rtok").cast("long")).as("sum_tokens"),
          min(col("n_rtok")).cast("long").as("min_tokens"),
          max(col("n_rtok")).cast("long").as("max_tokens"))
        .orderBy(col("lang"))
    }),

    // Tokenizer fertility per language — the multilingual tokenizer-
    // selection metric: subword units per whitespace word (high fertility
    // means the vocabulary underserves that language, inflating its
    // effective sequence lengths and training cost). The subword model is
    // a fixed-width BPE proxy — every word splits into ceil(len/4)
    // units — so fertility tracks each language's word-length
    // distribution; all counts are exact BIGINT sums and the ratios are
    // single divisions of those sums, no per-row double aggregates.
    // Shape at scale: ONE tokenize per row (toks materialized by its own
    // Project so the two counters read the attribute, not re-evaluate
    // the expression), one partial-agg rollup to ~5 lang rows; nothing
    // shuffles the corpus. A lang whose docs are ALL empty reports
    // fertility 0.0 explicitly — 0/0 NULL-vs-NaN semantics differ
    // between engines (the q132 empty-doc rule).
    "q140_tokenizer_fertility" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"),
          graft.plans.TextExpressions.tokens(col("text")).as("toks"))
        .select(col("lang"),
          size(col("toks")).cast("long").as("n_word"),
          aggregate(col("toks"), lit(0L),
            (acc, t) => acc + ((length(t) + lit(3)) / lit(4)).cast("long"))
            .as("n_sub"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_word")).as("words"),
          sum(col("n_sub")).as("subwords"))
        .select(col("lang"), col("n_docs"), col("words"), col("subwords"),
          when(col("words") === 0, lit(0.0))
            .otherwise(col("subwords").cast("double") / col("words").cast("double"))
            .as("fertility"),
          (col("subwords").cast("double") / col("n_docs").cast("double"))
            .as("subwords_per_doc"))
        .orderBy(col("lang"))
    }),

    // Content fingerprinting (md5 of canonicalized text) per language.
    "q29_fingerprints" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("fp", T.fingerprint(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_distinct_fp"))
        .orderBy(col("lang"))
    }),

    // TF-IDF top terms per document (docs 0-49): tf = in-doc term count,
    // idf = the BM25-style RATIO (N - df + 0.5)/(df + 0.5) — deliberately
    // no ln(): transcendental libm results differ in their last ulp across
    // engines, while this ratio is one integer-derived division. Ranking by
    // tf·idf is order-equivalent to ranking by ln-idf (ln is monotone).
    // Shape at scale: one explode→(doc,term) count, one term-level df
    // aggregate joined back — both the word-count shuffle.
    "q65_tfidf_terms" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val nDocs = lit(docs.count()) // tiny: one count of the dim-side corpus
      val tf = docs
        .select(col("doc_id"), explode(graft.plans.TextExpressions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id")).orderBy(desc("tfidf"), col("term"))
      tf.join(df, "term")
        .select(col("doc_id"), col("term"),
          (col("tf").cast("double") *
            ((nDocs.cast("double") - col("df").cast("double") + lit(0.5))
              / (col("df").cast("double") + lit(0.5)))).as("tfidf"))
        .filter(col("doc_id") < 50)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // Repetition-based quality signals (the Gopher/C4 family): type-token
    // ratio, top-token fraction, top-bigram fraction, and a repetitive flag.
    // Everything is exact integer counts → one double division, so the flag
    // thresholds are bit-reproducible. Shape at scale: two word-count
    // shuffles keyed by (doc, term) / (doc, bigram) with map-side partial
    // aggregation, then per-doc argmax folded into the same pass — never a
    // sort of the corpus. Bigrams keep MULTIPLICITY (TextFunctions.shingles,
    // not the deduped wordShingles): repetition is precisely what dedup
    // erases.
    "q89_repetition_quality" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), graft.plans.TextExpressions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .withColumn("n_tokens", size(col("toks")).cast("long"))
      // per-doc argmax WITHOUT a rank window: min(struct(-count, term))
      // over the term-count relation picks (highest count, then smallest
      // term). Struct buffers plan as partial-combinable SortAggregates
      // (map-side combine still applies) sharing the term-count Exchange —
      // the rank window's SECOND shuffle is gone, and n_distinct falls out
      // of the same aggregation as count(*) of the term groups (the old
      // separate countDistinct shuffle too)
      val tokCounts = docs
        .select(col("doc_id"), col("n_tokens"), explode(col("toks")).as("token"))
        .groupBy(col("doc_id"), col("n_tokens"), col("token"))
        .agg(count(lit(1)).as("c"))
      val topTok = tokCounts
        .groupBy(col("doc_id"), col("n_tokens"))
        .agg(min(struct((-col("c")).as("nc"), col("token"))).as("m"),
          count(lit(1)).as("n_distinct"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("m.token").as("top_token"),
          ((-col("m.nc")).cast("double") / col("n_tokens").cast("double"))
            .as("top_token_frac"))
      val topBigram = docs
        .select(col("doc_id"), col("n_tokens"),
          explode(T.shingles(col("toks"), 2)).as("bigram"))
        .groupBy(col("doc_id"), col("n_tokens"), col("bigram"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("n_tokens"))
        .agg(min(struct((-col("c")).as("nc"), col("bigram"))).as("m"))
        .select(col("doc_id"), col("m.bigram").as("top_bigram"),
          ((-col("m.nc")).cast("double") / (col("n_tokens") - 1).cast("double"))
            .as("top_bigram_frac"))
      topTok.join(topBigram, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          (col("n_distinct").cast("double") / col("n_tokens").cast("double")).as("ttr"),
          col("top_token"), col("top_token_frac"),
          col("top_bigram"), col("top_bigram_frac"),
          when(col("top_token_frac") > 0.12 || col("top_bigram_frac") > 0.05, 1L)
            .otherwise(0L).as("repetitive"))
        .orderBy(col("doc_id"))
    }),

    // BPE-style merge-candidate mining (the first round of tokenizer
    // induction): frequency of every ADJACENT token pair across the
    // corpus, top 50. One compiled pass emits the pairs (AdjacentPairs —
    // no dedup, multiplicity is the signal), then the word-count shape:
    // map-side partial counts collapse each partition to vocab size
    // before the exchange, and the top-k is TakeOrderedAndProject.
    // BPE VOCAB INDUCTION, three merge rounds (Sennrich et al. 2016,
    // public): the word inventory (word → corpus frequency) is the only
    // shuffled relation — rounds operate on it, never on the corpus.
    // Each round counts adjacent-symbol pairs (frequency-weighted),
    // picks the argmax merge (count desc, pair asc — deterministic),
    // and applies it greedily left-to-right via a string fold whose
    // semantics both engines reproduce exactly. The merge decision is
    // ONE collected row per round — the inherently global step of BPE
    // training (every real trainer does this); everything else is
    // distributed. At 100 TB the word inventory is orders of magnitude
    // smaller than the corpus, which is what makes iterative training
    // affordable.
    "q150_bpe_vocab" -> ((s, d) => {
      import s.implicits._
      // the inventory is materialized ONCE (RelationCache): each round's
      // argmax collect and the growing merge lineage otherwise re-scan
      // and re-tokenize the whole corpus per round
      val words = graft.sources.RelationCache.of(s, "bpe-words", d) {
        Tables.documents(s, d)
          .select(explode(graft.plans.TextExpressions.tokens(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("f"))
      }
      // initial symbol string: chars space-joined ("h e l l o")
      var cur = words.withColumn("syms", array_join(
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))), " "))
      val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      for (round <- 1L to 3L) {
        val top = cur
          .select(col("f"), split(col("syms"), " ").as("sy"))
          .filter(size(col("sy")) >= 2)
          .select(col("f"), explode(transform(sequence(lit(0), size(col("sy")) - 2),
            i => concat(element_at(col("sy"), i + 1), lit(" "),
              element_at(col("sy"), i + 2)))).as("pair"))
          .groupBy(col("pair")).agg(sum(col("f")).as("n"))
          .orderBy(desc("n"), col("pair")).limit(1)
          .collect()
        val (pair, n) = (top(0).getString(0), top(0).getLong(1))
        picked += ((round, pair, n))
        val Array(a, b) = pair.split(" ", 2)
        // greedy left-to-right non-overlapping merge as a string fold:
        // acc ends with symbol `a` (boundary-safe: exact or ' '+a) and the
        // next symbol is `b` → rewrite the tail to the merged symbol
        cur = cur.withColumn("syms",
          aggregate(split(col("syms"), " "), lit(""), (acc, x) =>
            when(acc === lit(""), x)
              .when((acc === lit(a) || endswith(acc, lit(" " + a))) && x === lit(b),
                concat(acc.substr(lit(1), length(acc) - lit(a.length)),
                  lit(a), lit(b)))
              .otherwise(concat(acc, lit(" "), x))))
      }
      picked.toSeq.toDF("round", "pair", "n").orderBy(col("round"))
    }),

    "q97_bpe_pairs" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(graft.plans.TextExpressions.adjacentPairs(col("text"))).as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("pair"))
        .limit(50)
    }),

    // PII-redaction shape over the JSON props payload: mask every digit
    // run, count masked runs and the distinct redacted shapes per event
    // type. Pure map-side regex (codegen'd) + one partial-aggregated
    // groupBy — at 100 TB this is a scan-rewrite, no corpus shuffle.
    "q99_redact" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          regexp_replace(col("props"), "[0-9]+", "#").as("masked"),
          size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_runs"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_runs")).as("masked_runs"),
          countDistinct(col("masked")).as("n_shapes"))
        .orderBy(col("event_type"))
    }),

    // Language-ID heuristic: marker-token votes, argmax with fixed
    // tie-break order; confusion counts against the labeled lang.
    "q30_lang_id" -> ((s, d) => {
      val toks = T.tokens(col("text"))
      def votes(words: Seq[String]) =
        size(filter(toks, t => t.isin(words.map(lit): _*)))
      val cEn = votes(Seq("the", "a", "fast"))
      val cEs = votes(Seq("table", "part", "line"))
      val cDe = votes(Seq("order", "group", "window"))
      val pred = when(cEn >= cEs && cEn >= cDe, "en")
        .when(cEs >= cDe, "es").otherwise("de")
      Tables.documents(s, d)
        .select(col("lang"), pred.as("pred"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))
    }),

    // RAG chunking: fixed-size token windows with overlap (window 8,
    // stride 4) — the preprocessing step between a raw corpus and the
    // embedding index the reference retrieves from (its index rows ARE
    // chunks; /root/reference/app/vector_search.py:29-33 returns
    // `content` snippets, not whole documents). Pure map-side fan-out
    // (sequence → posexplode → slice, all codegen'd): no shuffle, at most
    // ceil(n/stride) chunks per doc; the orderBy exists only for the
    // deterministic gate dump — a production write would keep the scan's
    // partitioning.
    "q123_chunk_overlap" -> ((s, d) => {
      val (win, stride) = (8, 4)
      Tables.documents(s, d)
        .select(col("doc_id"), graft.plans.TextExpressions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride))))
        .select(col("doc_id"),
          col("pos").cast("long").as("chunk_id"),
          col("col").cast("long").as("chunk_start"),
          slice(col("toks"), col("col") + 1, lit(win)).as("chunk_toks"))
        .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
          size(col("chunk_toks")).cast("long").as("n_tokens"),
          array_join(col("chunk_toks"), " ").as("chunk"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // BM25 lexical retrieval (k1=1.2, b=0.75) for a fixed 3-term query —
    // completes the retrieval family (exact cosine q36, IVF q37/q104,
    // MinHash-LSH q32, RRF hybrid q64) with the lexical scorer every RAG
    // stack pairs with ANN. The query mixes one rare term ('dup', df≈5%)
    // with two common ones, so idf separation is visible in the top-k.
    // Numeric parity: idf keeps the BM25 RATIO without ln() (the q65
    // note: transcendental libm results differ across engines in the last
    // ulp; the ratio is one integer-derived division), and the three
    // per-term contributions land in fixed pivot columns summed by one
    // fixed expression tree — never an order-dependent double SUM.
    // Shape at scale: word-count shuffle on (doc, term) for tf — the
    // filter on the query terms is BEFORE the aggregation, so the
    // exchange carries only matching postings — a 3-row df frame
    // broadcast back, one TakeOrderedAndProject top-k. The corpus-stat
    // scalars (N, avgdl) are one tiny pre-aggregate, the same dim-side
    // count q65 uses.
    // Per-source token-distribution concentration — the corpus-diversity
    // drift metric (a source whose token mass collapses onto few types is
    // template/boilerplate spam). Entropy needs ln() (cross-engine libm
    // drift, q65 note), so concentration is the Herfindahl sum instead:
    // gini = 1 − Σc²/N², computed from EXACT integer moments (Σc, Σc²)
    // with ONE double division at the end — bit-reproducible. Shape at
    // scale: the word-count shuffle on (source, token), then a per-source
    // rollup that rides the same partitioning; Σc² needs DECIMAL(38)
    // sums once per-token counts pass ~3e9 (long² overflow) — at the
    // gate SF the BIGINT moment is exact.
    "q130_source_diversity" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("source"),
          explode(graft.plans.TextExpressions.tokens(col("text"))).as("token"))
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("c"))
      tok.groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") * col("c")).as("sumsq"),
          max(col("c")).as("max_c"))
        .select(col("source"), col("n_tokens"), col("n_distinct"),
          (lit(1.0) - col("sumsq").cast("double")
            / (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
            .as("gini"),
          (col("max_c").cast("double") / col("n_tokens").cast("double"))
            .as("top_share"))
        .orderBy(col("source"))
    }),

    // Count-min sketch over the token stream — the bounded-memory
    // heavy-hitter counter (4 seeds × 64 buckets = 256 cells regardless
    // of vocabulary size; the HLL complement on the sketch surface next
    // to q44). Hashing is seeded md5 (the proven cross-engine
    // construct), so the WHOLE sketch — cells, estimates, overcounts —
    // is deterministic and oracle-checked, not just bounds-tested. The
    // output audits the CMS contract: est = min over seeds of the
    // colliding cell sums, always >= the true count. Shape at scale: the
    // word-count shuffle to token counts, then a 256-cell aggregate —
    // a production CMS folds tokens straight into cells map-side and
    // ships 256 longs per partition, never the vocabulary.
    "q131_cms_tokens" -> ((s, d) => {
      val W = 64
      val seeds = Seq(0, 1, 2, 3)
      def bucket(t: org.apache.spark.sql.Column, seed: Int) =
        T.md5Prefix(concat(lit(s"$seed:"), t), 8) % W
      // the (token → corpus count) relation IS q133's cached tf table —
      // share the one materialization (the suite's shared-relation
      // convention: one tokenize+count per corpus, not one per consumer)
      val tok = graft.sources.RelationCache.of(s, "textanalysis.q133tf", d) {
        Tables.documents(s, d)
          .select(explode(graft.plans.TextExpressions.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("c"))
      }
      val h = tok.select(col("token"), col("c"),
          explode(array(seeds.map(sd =>
            struct(lit(sd).as("seed"), bucket(col("token"), sd).as("b"))): _*))
            .as("sb"))
        .select(col("token"), col("c"),
          col("sb.seed").as("seed"), col("sb.b").as("b"))
      val cells = h.groupBy(col("seed"), col("b")).agg(sum(col("c")).as("cell"))
      h.join(cells, Seq("seed", "b"))
        .groupBy(col("token"))
        .agg(min(col("c")).as("true_count"), min(col("cell")).as("est"))
        .select(col("token"), col("true_count"), col("est"),
          (col("est") - col("true_count")).as("overcount"))
        .orderBy(col("token"))
    }),

    // Unigram-familiarity quality filter — the linear-space stand-in for
    // CCNet-style LM-perplexity filtering: a doc's score is the average
    // corpus probability of its tokens. True perplexity needs ln()
    // (cross-engine libm drift, q130 note); avg probability keeps the
    // same ordering signal for band filtering and is exactly computable:
    // two BIGINT sums per doc (n_tok, Σ corpus-count) and two chained
    // double divisions — every op IEEE-exact. The band drops both tails:
    // alien text (garbled/wrong-language, score below) and degenerate
    // boilerplate (templated head-token spam, score above). Shape at
    // scale: word-count shuffle for tf; the token→tf join rides that
    // same hash partitioning (no extra exchange); per-doc rollup, then a
    // tiny per-lang partial agg. The 1-row total joins by broadcast.
    "q133_familiarity_filter" -> ((s, d) => {
      val (lo, hi) = (0.0330, 0.0334)
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(graft.plans.TextExpressions.tokens(col("text"))).as("token"))
      // vocab-sized; cached so the total and the join build don't each
      // re-scan + re-tokenize the corpus (3 scans → 2 without it)
      val tf = graft.sources.RelationCache.of(s, "textanalysis.q133tf", d) {
        tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
      }
      val total = tf.agg(sum(col("c")).as("total"))
      tok.join(tf, "token")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tok"), sum(col("c")).as("sum_c"))
        .crossJoin(broadcast(total))
        .withColumn("fam", col("sum_c").cast("double")
          / col("n_tok").cast("double") / col("total").cast("double"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("fam").between(lo, hi), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("fam") < lo, 1L).otherwise(0L)).as("n_alien"),
          sum(when(col("fam") > hi, 1L).otherwise(0L)).as("n_boiler"))
        .orderBy(col("lang"))
    }),

    "q124_bm25" -> ((s, d) => {
      val terms = Seq("dup", "scan", "table")
      // tokenized once per (session, dir): the plan walks this relation 4×
      // (N, sum(dl), tf, df) — without the cache that is 4 corpus scans +
      // 2 tokenize passes; with it, one (see RelationCache scaladoc)
      val docs = graft.sources.RelationCache.of(s, "textanalysis.q124docs", d) {
        Tables.documents(s, d)
          .select(col("doc_id"), graft.plans.TextExpressions.tokens(col("text")).as("toks"))
      }
      val stats = docs.agg(count(lit(1)), sum(size(col("toks")).cast("long"))).first()
      val (nDocs, sumDl) = (stats.getLong(0), stats.getLong(1))
      val avgdl = lit(sumDl.toDouble / nDocs.toDouble)
      val tf = docs
        .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
          explode(col("toks")).as("term"))
        .filter(col("term").isin(terms.map(lit): _*))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).cast("double").as("tf"))
      val dfr = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
      val contrib = tf.join(broadcast(dfr), "term")
        .select(col("doc_id"), col("term"),
          ((((lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
            * (col("tf") * lit(2.2)))
            / (col("tf") + lit(1.2) * (lit(0.25) + (lit(0.75) * col("dl")) / avgdl)))
            .as("c"))
      def pick(t: String) =
        coalesce(max(when(col("term") === t, col("c"))), lit(0.0))
      contrib.groupBy(col("doc_id"))
        .agg(pick("dup").as("c_dup"), pick("scan").as("c_scan"),
          pick("table").as("c_table"))
        .select(col("doc_id"),
          (col("c_dup") + col("c_scan") + col("c_table")).as("score"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(20)
    }))

  private val toksSql = T.sqlToks

  def oracle: Map[String, String] = Map(
    // q216 twin: THE tokenization convention (toksSql — trim + \s+
    // split + empty-token filter, the one body every text oracle
    // shares), the same gram conventions (count × 2 coverage,
    // duplicate OCCURRENCES), all integers — hash-exact against the
    // compiled expression. NULL text stays NULL across all four
    // signal columns (nullSafeEval parity); a short doc's missing
    // gram rows COALESCE to 0, never NULL.
    "q216_repetition_signals" ->
      s"""WITH lst AS (SELECT doc_id, $toksSql AS l FROM documents),
          base AS (SELECT doc_id, len(l) AS n, l FROM lst),
          bidx AS (SELECT doc_id, l, unnest(range(1, len(l))) AS i
                   FROM base),
          big AS (SELECT doc_id, l[i] || ' ' || l[i+1] AS g FROM bidx),
          bic AS (SELECT doc_id, g, count(*) AS c FROM big GROUP BY 1, 2),
          top2 AS (SELECT doc_id, CAST(max(c) * 2 AS BIGINT) AS top2_cov
                   FROM bic GROUP BY 1),
          gidx AS (SELECT doc_id, l, unnest(range(1, len(l) - 1)) AS i
                   FROM base),
          g3 AS (SELECT doc_id,
                   l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g FROM gidx),
          g3c AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
          d3 AS (SELECT doc_id,
                   CAST(COALESCE(sum(CASE WHEN c > 1 THEN c END), 0)
                     AS BIGINT) AS dup3_occ,
                   CAST(sum(c) AS BIGINT) AS n3 FROM g3c GROUP BY 1)
          SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
            CASE WHEN b.l IS NULL THEN NULL
                 ELSE COALESCE(t.top2_cov, 0) END AS top2_cov,
            CASE WHEN b.l IS NULL THEN NULL
                 ELSE COALESCE(d.dup3_occ, 0) END AS dup3_occ,
            CASE WHEN b.l IS NULL THEN NULL
                 ELSE COALESCE(d.n3, 0) END AS n3,
            CASE WHEN b.l IS NULL THEN NULL
                 ELSE COALESCE(d.dup3_occ, 0) > 0 END AS repetitive
          FROM base b LEFT JOIN top2 t USING(doc_id)
            LEFT JOIN d3 d USING(doc_id)
          ORDER BY doc_id""",

    "q169_bigram_lm" ->
      s"""WITH bgr AS (SELECT doc_id, lang,
                   unnest([toks[i] || ' ' || toks[i + 1]
                     FOR i IN range(1, len(toks))]) AS bg
                 FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents)),
          lm AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12,
                   string_split(bg, ' ')[1] AS w1
                 FROM bgr GROUP BY bg),
          ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
                  FROM lm GROUP BY w1),
          vals AS (SELECT v, v AS num, CAST(1 AS BIGINT) AS den FROM (
                     SELECT DISTINCT c12 AS v FROM lm
                     UNION SELECT DISTINCT c1 AS v FROM ctx)),
          ${T.sqlIlog2Ctes("blm", "vals", "v")},
          nll AS (SELECT lm.bg, (wc1.wt - wc12.wt) AS nll
                  FROM lm JOIN ctx USING (w1)
                  JOIN blmwts wc12 ON lm.c12 = wc12.v
                  JOIN blmwts wc1 ON ctx.c1 = wc1.v),
          docbg AS (SELECT doc_id, lang, bg, CAST(count(*) AS BIGINT) AS k
                    FROM bgr GROUP BY 1, 2, 3),
          ce AS (SELECT doc_id, lang,
                   CAST(sum(k * nll) AS BIGINT) // CAST(sum(k) AS BIGINT) AS bpt
                 FROM docbg JOIN nll USING (bg) GROUP BY doc_id, lang)
          SELECT lang, count(*) AS n_docs,
            CAST(sum(bpt) AS BIGINT) AS sum_ce_micro,
            CAST(sum(CASE WHEN bpt > $HighCeMicro THEN 1 ELSE 0 END) AS BIGINT)
              AS n_flagged
          FROM ce GROUP BY lang ORDER BY lang""",
    "q166_token_entropy" ->
      s"""WITH tokc AS (SELECT doc_id, lang, t, CAST(count(*) AS BIGINT) AS c
                 FROM (SELECT doc_id, lang, unnest($toksSql) AS t FROM documents)
                 GROUP BY 1, 2, 3),
          nd AS (SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n
                 FROM tokc GROUP BY 1, 2),
          vals AS (SELECT v, v AS num, CAST(1 AS BIGINT) AS den FROM (
                     SELECT DISTINCT c AS v FROM tokc
                     UNION SELECT DISTINCT n AS v FROM nd)),
          ${T.sqlIlog2Ctes("ent", "vals", "v")},
          cw AS (SELECT doc_id, lang, CAST(sum(c * w.wt) AS BIGINT) AS sumcw
                 FROM tokc JOIN entwts w ON tokc.c = w.v GROUP BY 1, 2),
          docs AS (SELECT nd.lang, (nd.n * wn.wt - cw.sumcw) // nd.n AS ent
                   FROM nd JOIN entwts wn ON nd.n = wn.v
                   JOIN cw USING (doc_id, lang))
          SELECT lang, count(*) AS n_docs,
            CAST(sum(ent) AS BIGINT) AS sum_entropy_micro,
            CAST(sum(CASE WHEN ent < 12288 THEN 1 ELSE 0 END) AS BIGINT) AS n_lowent
          FROM docs GROUP BY lang ORDER BY lang""",
    "q133_familiarity_filter" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($toksSql) AS token FROM documents),
          tf AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
          n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM tf),
          doc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tok,
                    CAST(sum(c) AS BIGINT) AS sum_c
                  FROM tok JOIN tf USING (token) GROUP BY doc_id, lang),
          f AS (SELECT lang, CAST(sum_c AS DOUBLE) / CAST(n_tok AS DOUBLE)
                              / CAST(total AS DOUBLE) AS fam FROM doc, n)
          SELECT lang, count(*) AS n_docs,
            CAST(sum(CASE WHEN fam BETWEEN 0.0330 AND 0.0334 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            CAST(sum(CASE WHEN fam < 0.0330 THEN 1 ELSE 0 END) AS BIGINT) AS n_alien,
            CAST(sum(CASE WHEN fam > 0.0334 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
          FROM f GROUP BY lang ORDER BY lang""",

    "q25_word_counts" ->
      s"""SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
          FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
          GROUP BY token ORDER BY n DESC, token""",

    "q26_lang_stats" ->
      s"""SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          ${Exact.sqlIntAvg("n_chars")} AS avg_chars,
          CAST(sum(CAST(len($toksSql) AS BIGINT)) AS DOUBLE) / count(*) AS avg_tokens,
          count(DISTINCT source) AS n_sources
          FROM documents GROUP BY lang ORDER BY lang""",

    "q27_quality_score" ->
      s"""SELECT doc_id, lang, len(toks) AS n_tokens,
          0.5 * (1.0 - CAST(len(list_filter(toks, t -> t IN ('a','the','of','and','to','in'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
          + 0.5 * least(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) / 8.0, 1.0) AS score
          FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents)
          ORDER BY score DESC, doc_id LIMIT 100""",

    "q28_token_counts" ->
      s"""SELECT lang, CAST(sum(CAST(${T.sqlRegexTokenCount} AS BIGINT)) AS BIGINT) AS sum_tokens,
          min(${T.sqlRegexTokenCount}) AS min_tokens,
          max(${T.sqlRegexTokenCount}) AS max_tokens
          FROM documents GROUP BY lang ORDER BY lang""",

    "q140_tokenizer_fertility" ->
      s"""SELECT lang, n_docs, words, subwords,
            CASE WHEN words = 0 THEN 0.0
                 ELSE CAST(subwords AS DOUBLE) / CAST(words AS DOUBLE)
            END AS fertility,
            CAST(subwords AS DOUBLE) / CAST(n_docs AS DOUBLE) AS subwords_per_doc
          FROM (SELECT lang, count(*) AS n_docs,
                  CAST(sum(CAST(len(toks) AS BIGINT)) AS BIGINT) AS words,
                  CAST(sum(CAST(coalesce(list_sum(list_transform(toks,
                    t -> (len(t) + 3) // 4)), 0) AS BIGINT)) AS BIGINT) AS subwords
                FROM (SELECT lang, $toksSql AS toks FROM documents)
                GROUP BY lang)
          ORDER BY lang""",

    "q29_fingerprints" ->
      s"""SELECT lang, count(*) AS n_docs,
          count(DISTINCT ${T.sqlFingerprint}) AS n_distinct_fp
          FROM documents GROUP BY lang ORDER BY lang""",

    "q65_tfidf_terms" ->
      s"""WITH tf AS (SELECT doc_id, term, count(*) AS tfc
                      FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents)
                      GROUP BY doc_id, term),
          dfreq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY term),
          nd AS (SELECT count(*) AS n FROM documents)
          SELECT doc_id, rank, term, tfidf FROM (
            SELECT doc_id, term, tfidf,
              row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
            FROM (SELECT tf.doc_id, tf.term,
                    CAST(tfc AS DOUBLE) *
                      ((CAST(n AS DOUBLE) - CAST(dfc AS DOUBLE) + 0.5)
                        / (CAST(dfc AS DOUBLE) + 0.5)) AS tfidf
                  FROM tf JOIN dfreq USING (term), nd
                  WHERE tf.doc_id < 50))
          WHERE rank <= 3 ORDER BY doc_id, rank""",

    "q89_repetition_quality" ->
      s"""WITH d2 AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
              FROM (SELECT doc_id, $toksSql AS toks FROM documents)
              WHERE len(toks) >= 2),
          tok AS (SELECT doc_id, n_tokens, unnest(toks) AS token FROM d2),
          nd AS (SELECT doc_id, count(DISTINCT token) AS n_distinct
                 FROM tok GROUP BY doc_id),
          tt AS (SELECT doc_id, n_tokens, token AS top_token,
                   CAST(c AS DOUBLE) / n_tokens AS top_token_frac
                 FROM (SELECT doc_id, n_tokens, token, c,
                         row_number() OVER (PARTITION BY doc_id
                           ORDER BY c DESC, token) AS rn
                       FROM (SELECT doc_id, n_tokens, token, count(*) AS c
                             FROM tok GROUP BY doc_id, n_tokens, token))
                 WHERE rn = 1),
          bg AS (SELECT doc_id, n_tokens,
                   unnest([toks[i] || ' ' || toks[i + 1]
                     FOR i IN range(1, len(toks))]) AS bigram FROM d2),
          tb AS (SELECT doc_id, bigram AS top_bigram,
                   CAST(c AS DOUBLE) / (n_tokens - 1) AS top_bigram_frac
                 FROM (SELECT doc_id, n_tokens, bigram, c,
                         row_number() OVER (PARTITION BY doc_id
                           ORDER BY c DESC, bigram) AS rn
                       FROM (SELECT doc_id, n_tokens, bigram, count(*) AS c
                             FROM bg GROUP BY doc_id, n_tokens, bigram))
                 WHERE rn = 1)
          SELECT tt.doc_id, n_tokens, n_distinct,
            CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
            top_token, top_token_frac, top_bigram, top_bigram_frac,
            CAST(CASE WHEN top_token_frac > 0.12 OR top_bigram_frac > 0.05
                 THEN 1 ELSE 0 END AS BIGINT) AS repetitive
          FROM tt JOIN nd ON tt.doc_id = nd.doc_id
                  JOIN tb ON tt.doc_id = tb.doc_id
          ORDER BY tt.doc_id""",

    // unrolled 3-round BPE twin: same word inventory, same weighted pair
    // counts, same argmax rule, and the merge applied through DuckDB's
    // list_reduce with IDENTICAL greedy left-to-right string-fold
    // semantics (first element seeds the accumulator; Spark's empty-seed
    // special case is equivalent)
    "q150_bpe_vocab" -> {
      def pairsOf(src: String, out: String) =
        s"""$out AS (
              SELECT p, CAST(sum(f) AS BIGINT) AS n FROM (
                SELECT f, unnest([syms[i] || ' ' || syms[i + 1]
                  FOR i IN range(1, len(syms))]) AS p
                FROM (SELECT f, string_split(s, ' ') AS syms FROM $src)
                WHERE len(syms) >= 2)
              GROUP BY p)"""
      def argmax(cnt: String, out: String) =
        s"""$out AS (SELECT split_part(p, ' ', 1) AS a,
              split_part(p, ' ', 2) AS b, p, n
            FROM $cnt ORDER BY n DESC, p LIMIT 1)"""
      def applyMerge(src: String, m: String, out: String) =
        s"""$out AS (
              SELECT f, list_reduce(string_split(s, ' '), (acc, x) ->
                CASE WHEN (acc = $m.a OR ends_with(acc, ' ' || $m.a)) AND x = $m.b
                     THEN left(acc, len(acc) - len($m.a)) || $m.a || $m.b
                     ELSE acc || ' ' || x END) AS s
              FROM $src, $m)"""
      s"""WITH words AS (
            SELECT word, count(*) AS f FROM (
              SELECT unnest($toksSql) AS word FROM documents)
            GROUP BY word),
          w0 AS (SELECT f, list_aggr([word[i:i]
                   FOR i IN range(1, len(word) + 1)], 'string_agg', ' ') AS s
                 FROM words),
          ${pairsOf("w0", "r1")}, ${argmax("r1", "m1")},
          ${applyMerge("w0", "m1", "w1")},
          ${pairsOf("w1", "r2")}, ${argmax("r2", "m2")},
          ${applyMerge("w1", "m2", "w2")},
          ${pairsOf("w2", "r3")}, ${argmax("r3", "m3")}
          SELECT CAST(1 AS BIGINT) AS round, p AS pair, n FROM m1
          UNION ALL SELECT 2, p, n FROM m2
          UNION ALL SELECT 3, p, n FROM m3
          ORDER BY round"""
    },

    "q97_bpe_pairs" ->
      s"""SELECT pair, count(*) AS n
          FROM (SELECT unnest([toks[i] || ' ' || toks[i + 1]
                  FOR i IN range(1, len(toks))]) AS pair
                FROM (SELECT $toksSql AS toks FROM documents))
          GROUP BY pair ORDER BY n DESC, pair LIMIT 50""",

    "q99_redact" ->
      """SELECT event_type, count(*) AS n,
          CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS masked_runs,
          count(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g')) AS n_shapes
          FROM events GROUP BY event_type ORDER BY event_type""",

    "q30_lang_id" ->
      s"""SELECT lang, pred, count(*) AS n FROM (
            SELECT lang,
              CASE WHEN c_en >= c_es AND c_en >= c_de THEN 'en'
                   WHEN c_es >= c_de THEN 'es' ELSE 'de' END AS pred
            FROM (SELECT lang,
                len(list_filter($toksSql, t -> t IN ('the','a','fast'))) AS c_en,
                len(list_filter($toksSql, t -> t IN ('table','part','line'))) AS c_es,
                len(list_filter($toksSql, t -> t IN ('order','group','window'))) AS c_de
              FROM documents))
          GROUP BY lang, pred ORDER BY lang, pred""",

    "q123_chunk_overlap" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents
                     WHERE len($toksSql) > 0),
          g AS (SELECT doc_id, toks,
                  unnest(generate_series(0, CAST(len(toks) AS BIGINT) - 1, 4)) AS st
                FROM t)
          SELECT doc_id, CAST(st // 4 AS BIGINT) AS chunk_id,
            CAST(st AS BIGINT) AS chunk_start,
            CAST(len(list_slice(toks, st + 1, st + 8)) AS BIGINT) AS n_tokens,
            array_to_string(list_slice(toks, st + 1, st + 8), ' ') AS chunk
          FROM g ORDER BY doc_id, chunk_id""",

    "q131_cms_tokens" ->
      s"""WITH tok AS (SELECT token, count(*) AS c
                       FROM (SELECT unnest($toksSql) AS token FROM documents)
                       GROUP BY token),
          h AS (SELECT token, c, seed,
                  ${T.sqlMd5Prefix("seed || ':' || token", 8)} % 64 AS b
                FROM tok, (SELECT unnest([0, 1, 2, 3]) AS seed) s),
          cells AS (SELECT seed, b, CAST(sum(c) AS BIGINT) AS cell
                    FROM h GROUP BY seed, b)
          SELECT token, CAST(min(c) AS BIGINT) AS true_count,
            CAST(min(cell) AS BIGINT) AS est,
            CAST(min(cell) - min(c) AS BIGINT) AS overcount
          FROM h JOIN cells USING (seed, b)
          GROUP BY token ORDER BY token""",

    "q130_source_diversity" ->
      s"""WITH tok AS (SELECT source, token, count(*) AS c
                       FROM (SELECT source, unnest($toksSql) AS token FROM documents)
                       GROUP BY source, token),
          m AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                  count(*) AS n_distinct,
                  CAST(sum(c * c) AS BIGINT) AS sumsq,
                  CAST(max(c) AS BIGINT) AS max_c
                FROM tok GROUP BY source)
          SELECT source, n_tokens, n_distinct,
            1.0 - CAST(sumsq AS DOUBLE)
              / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS gini,
            CAST(max_c AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_share
          FROM m ORDER BY source""",

    "q124_bm25" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
                 FROM t),
          tf AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, term,
                   CAST(count(*) AS DOUBLE) AS tf
                 FROM (SELECT doc_id, toks, unnest(toks) AS term FROM t)
                 WHERE term IN ('dup','scan','table')
                 GROUP BY 1, 2, 3),
          dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
          c AS (SELECT doc_id, term,
                  ((((n - df + 0.5) / (df + 0.5)) * (tf * 2.2))
                    / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl))) AS c
                FROM tf JOIN dfreq USING (term), st)
          SELECT doc_id,
            coalesce(max(CASE WHEN term = 'dup' THEN c END), 0.0)
              + coalesce(max(CASE WHEN term = 'scan' THEN c END), 0.0)
              + coalesce(max(CASE WHEN term = 'table' THEN c END), 0.0) AS score
          FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""")
}
