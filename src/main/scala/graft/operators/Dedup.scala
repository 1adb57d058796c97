package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.plans.{TextExpressions, VectorExpressions}
import graft.sources.Tables

/** Deduplication operators (north-star mandate; generalizes the reference's
  * distinct-accumulation for citations, `app/app.py:111-124`).
  *
  * Scale design notes:
  *  - exact dedup = one shuffle on the dedup key with a rank-1 window (NOT
  *    `dropDuplicates`, whose survivor row is nondeterministic);
  *  - near-dup never does an all-pairs cross join: candidates come from an
  *    inverted-index join (shared shingle), MinHash-band bucketing, or
  *    sign-random-projection bucketing (embeddings), all of which shuffle
  *    O(docs × shingles) instead of O(docs²);
  *  - every `collect_list → packed-pairs` bucket is capped at
  *    [[StopShingleCap]]: a single hot key (stop-shingle, degenerate band)
  *    would otherwise materialize m(m−1)/2 packed longs in ONE task — the
  *    classic skewed-corpus OOM. The cap is mirrored in every oracle twin
  *    (`HAVING count(*) < cap`), so results stay hash-identical; the cost is
  *    recall only: a pair whose every shared key is hot is not a candidate;
  *  - all hashes are md5 hex (engine-portable); MinHash takes the
  *    lexicographic min of seeded md5s — a valid min-wise permutation proxy;
  *  - no hard `broadcast()` hints on corpus-derived relations (shingle sets,
  *    sizes): they grow with the corpus, and a forced broadcast becomes a
  *    driver OOM at 100×. AQE still broadcasts them while they're small.
  */
object Dedup {
  /** Max docs per candidate bucket (shingle posting list, MinHash band
    * bucket, SRP bucket) before it is dropped as a stop-key. 1000 docs →
    * worst-case 499 500 packed longs ≈ 4 MB per bucket — bounded per task.
    * Never binds at the test SFs (max shingle df is 25 at sf0.1), so it is
    * purely the skew guard SURVEY §8 documents. */
  val StopShingleCap = 1000

  /** 3-gram word shingles of the doc text (order-sensitive — the corpus has
    * a tiny vocab, so token *sets* saturate; shingles don't). Uses the
    * compiled single-pass expression (graft.plans.TextExpressions); the
    * built-in HOF form it replaces is TextFunctions.shingles — identical
    * output, ~100× less per-row interpretation. Docs with <3 tokens (empty
    * shingle array) are dropped, matching the twin's `len(toks) >= 3`:
    * they would otherwise carry all-null MinHash signatures that collide in
    * one shared null band. */
  // The corpus shingle index is used by 2-3 branches of every near-dup
  // plan (signature side + both verify sides) and by four queries
  // (q32/q34/q50/q68). RelationCache caches it once per (session, dir) —
  // every identical use reads the materialized relation instead of
  // re-tokenizing the corpus (the local analog of persisting the shingle
  // index as a table, which is what a 100 TB pipeline does) — and retires
  // the previous dir's copy on a dir switch, so storage memory never
  // accumulates stale corpora across a long driver session.
  private def shingleDf(s: SparkSession, d: String): DataFrame =
    graft.sources.RelationCache.of(s, "dedup.shingles", d) {
      Tables.documents(s, d)
        .select(col("doc_id"), TextExpressions.wordShingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
    }

  private val sqlShingleDf =
    s"""SELECT doc_id, list_distinct([list_aggr(toks[i:i+2], 'string_agg', ' ')
          FOR i IN range(1, len(toks) - 1)]) AS sh
        FROM (SELECT doc_id, ${T.sqlToks} AS toks FROM documents)
        WHERE len(toks) >= 3"""

  /** Unpack a packed (a<<32|b) pair column, keeping any other columns.
    * Unsigned shift: ids in [2^31, 2^32) would sign-extend under
    * arithmetic shiftright. */
  private def unpack(df: DataFrame): DataFrame =
    df.withColumn("a", shiftrightunsigned(col("pk"), 32))
      .withColumn("b", col("pk").bitwiseAND(0xffffffffL))
      .drop("pk")

  /** Candidate buckets → packed pairs, with the stop-key cap applied.
    * One shuffle of the keyed relation replaces a self-join of the index
    * against itself. Packing assumes ids < 2^32 — beyond that (never at
    * these SFs) swap the packed explode for the equivalent inv⋈inv join;
    * everything downstream is unchanged. */
  private def cappedPackedPairs(keyed: DataFrame, keyCols: Seq[Column]): DataFrame =
    keyed.groupBy(keyCols: _*).agg(collect_list(col("id")).as("ds"))
      .filter(size(col("ds")) < StopShingleCap)
      .select(explode(TextExpressions.packedPairs(col("ds"))).as("pk"))

  /** Shared-shingle counts per candidate pair WITHOUT a self-join:
    * groupBy(shingle) collects the (sorted) posting list, a compiled
    * expression emits every (a<<32|b) pair packed in one long, and a single
    * hash agg counts them. `shared` counts co-occurrences in NON-hot
    * posting lists only (the cap), so the derived Jaccard is exact until a
    * corpus has stop-shingles, then conservatively lower — mirrored
    * identically in the oracle twins. */
  private[operators] def pairSharedCounts(inv: DataFrame): DataFrame =
    unpack(cappedPackedPairs(inv.select(col("shingle"), col("doc_id").as("id")),
        Seq(col("shingle")))
      .groupBy(col("pk")).agg(count(lit(1)).as("shared")))

  private def pairJaccard(s: SparkSession, d: String): DataFrame = {
    val sh = shingleDf(s, d)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    pairSharedCounts(inv)
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"), (col("shared").cast("double")
        / (col("na") + col("nb") - col("shared")).cast("double")).as("jaccard"))
  }

  /** Near-dup pairs at the 0.5 Jaccard threshold, cached per (session,
    * dir) like [[shingleDf]]: q34 (the pairs) and q68 (clusters over the
    * same pairs) share this exact relation, and the post-filter result is
    * dozens of rows — the cache costs nothing and saves the second query
    * its whole pair-count aggregation. */
  private[operators] def dupPairs(s: SparkSession, d: String): DataFrame =
    graft.sources.RelationCache.of(s, "dedup.dupPairs", d) {
      pairJaccard(s, d).filter(col("jaccard") >= 0.5)
    }

  /** MinHash-LSH candidate pairs (a < b), shared by q32 (verify-and-keep)
    * and q185 (banding-quality eval). One long-format (doc, band_idx,
    * band_key) relation: the 16-component signature is computed ONCE per
    * doc and exploded into 8 band keys; candidate generation shuffles on
    * (band_idx, key) so the whole signature is evaluated once, not once
    * per band join; hot band buckets are capped (StopShingleCap). */
  private def lshCandidatePairs(s: SparkSession, d: String): DataFrame =
    graft.sources.RelationCache.of(s, "dedup.lshCands", d) {
      val sig = shingleDf(s, d)
        .withColumn("sig", TextExpressions.minhashSigMix(col("sh"), 16))
      val banded = sig.select(col("doc_id").as("id"), posexplode(array((0 until 8).map(b =>
        concat_ws("-", element_at(col("sig"), 2 * b + 1), element_at(col("sig"), 2 * b + 2))): _*))
        .as(Seq("band_idx", "bk")))
      unpack(cappedPackedPairs(banded, Seq(col("band_idx"), col("bk"))).distinct())
    }

  /** Duplicate CLUSTERS (q68's converged result: cluster representative →
    * member count for every n>1 component), RelationCache'd per (session,
    * dir): the connected-components loop below runs ONCE per corpus, and
    * every consumer — q68 itself, q152's effective-corpus accounting —
    * reads the same converged relation, so they can never disagree about
    * what a duplicate cluster is and the loop is never re-iterated.
    *
    * Connected components over the near-dup pair graph (capped
    * inverted-index candidates, Jaccard ≥ 0.5) by iterative min-label
    * propagation. The fixpoint — every doc labeled with the smallest
    * doc_id reachable through dup edges — is UNIQUE, so the result is
    * deterministic regardless of iteration schedule, and the DuckDB twin
    * can compute it with a recursive CTE instead of mirroring the loop.
    * Each round is one join + one aggregate (the standard distributed CC
    * step); rounds needed = graph diameter (tiny for dup clusters).
    *
    * Cache discipline: the loop's intermediates (the symmetrized edge
    * relation and per-round label frames) are persisted only while the
    * loop runs; once the converged cluster aggregate is materialized into
    * its own cache, every intermediate is unpersisted — steady state
    * holds exactly ONE tiny relation per corpus, on any heap, with no
    * GC-coupled release (PLANS.md forensics: a GC-coupled design read
    * 2.7 s → 14.8 s on a 16 GiB heap). Eviction recomputes through the
    * full join lineage — correct, just slower. */
  private[graft] def dupClusters(s: SparkSession, d: String): DataFrame =
    graft.sources.RelationCache.of(s, "dedup.dupClusters", d) {
      dupClusterLabels(s, d)
        .groupBy(col("label").as("cluster_rep"))
        .agg(count(lit(1)).as("n_members"))
        .filter(col("n_members") > 1)
        .orderBy(col("cluster_rep"))
    }

  /** The converged CC LABELS themselves — (doc_id, label) for every
    * non-isolated vertex, label = smallest doc_id reachable through dup
    * edges. [[dupClusters]] aggregates this; q155 needs the membership
    * to pick a canonical doc per cluster. Cached separately (both frames
    * are tiny: O(dup docs)). */
  private[graft] def dupClusterLabels(s: SparkSession, d: String): DataFrame =
    graft.sources.RelationCache.of(s, "dedup.dupLabels", d) {
      val pairs = dupPairs(s, d).select(col("a"), col("b"))
      val edges = pairs.unionByName(
          pairs.select(col("b").as("a"), col("a").as("b")))
        .withColumnRenamed("a", "src").withColumnRenamed("b", "dst")
        .cache()
      // Only edge endpoints can land in an n>1 cluster, so the label
      // frontier is the (tiny) non-isolated vertex set — the corpus-sized
      // singleton set never enters the loop. At 100 TB the iteration
      // state is O(dup docs), not O(docs).
      val nodes = edges.select(col("src").as("doc_id")).distinct()
      var cached = nodes.select(col("doc_id"), col("doc_id").as("label")).cache()
      var labels = cached
      var changed = 1L
      while (changed > 0) {
        val neighborMin = edges.join(labels, edges("dst") === labels("doc_id"))
          .groupBy(col("src")).agg(min(col("label")).as("nmin"))
        // carry the previous label through the update so the convergence
        // check is a filter on the SAME cached relation — one action per
        // round (materialize + count changed together), not a second
        // join job over the frontier
        val joined = labels.join(neighborMin,
          labels("doc_id") === neighborMin("src"), "left")
        val next = joined.select(labels("doc_id").as("doc_id"),
          least(labels("label"), coalesce(col("nmin"), labels("label"))).as("label"),
          labels("label").as("old")).cache()
        changed = next.filter(col("label") =!= col("old")).count()
        // `labels` is a projection of `cached` — unpersist the cached DF
        // itself or the block never releases
        cached.unpersist(false)
        cached = next
        labels = next.select(col("doc_id"), col("label"))
      }
      // TRUNCATE the lineage: after N rounds the labels plan is an
      // N-deep join chain, and although execution reads the cache,
      // Catalyst re-analyzes and re-optimizes that whole tree on EVERY
      // consumer invocation (~1 s of pure planning per q68/q155 call,
      // measured at sf0.1). One eager localCheckpoint per (session,
      // corpus) collapses it to a LogicalRDD — planning cost becomes
      // O(1). This is NOT the round-4 GC-coupled pattern the verdict
      // flagged: that design checkpointed PER INVOCATION, so dead blocks
      // accreted until a GC noticed; here RelationCache holds exactly
      // one checkpoint per corpus for the session's lifetime, and
      // repeated invocations reuse it (Round5Spec pins the flatness).
      val out = labels.localCheckpoint(true)
      edges.unpersist(false)
      cached.unpersist(false)
      out
    }

  /** DuckDB twin of the capped shared-count Jaccard over a (doc_id, sh)
    * relation: inverted index restricted to posting lists below the cap,
    * pair counts from the capped index, set sizes from the full relation —
    * the exact mirror of [[pairSharedCounts]] + the sizes joins. */
  /** DuckDB twin of [[lshCandidatePairs]] — the capped 8-band MinHash
    * candidate set, shared by the q32 and q185 oracles. */
  private lazy val sqlLshCandidates: String = {
    def bandSql(alias: String, b: Int): String =
      (0 until 2).map(j =>
        s"CAST(${T.sqlMinhashMix(s"$alias.sh", b * 2 + j)} AS VARCHAR)")
        .mkString(" || '-' || ")
    (0 until 8).map { b =>
      s"""SELECT x.doc_id AS a, y.doc_id AS b
          FROM ($sqlShingleDf) x JOIN ($sqlShingleDf) y
          ON (${bandSql("x", b)}) = (${bandSql("y", b)}) AND x.doc_id < y.doc_id
          WHERE (${bandSql("x", b)}) IN (
            SELECT bk FROM (SELECT (${bandSql("s", b)}) AS bk
                            FROM ($sqlShingleDf) s)
            GROUP BY bk HAVING count(*) < $StopShingleCap)"""
    }.mkString("SELECT DISTINCT a, b FROM (", " UNION ALL ", ")")
  }

  private def sqlCappedCountJaccard(shRelation: String): String =
    s"""WITH sh_rel AS ($shRelation),
        inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh_rel),
        cinv AS (SELECT inv.doc_id, inv.shingle FROM inv
                 JOIN (SELECT shingle FROM inv GROUP BY shingle
                       HAVING count(*) < $StopShingleCap) ok USING (shingle)),
        pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
                  FROM cinv x JOIN cinv y
                    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                  GROUP BY 1, 2)
        SELECT a, b, CAST(shared AS DOUBLE)
          / CAST(na + nb - shared AS DOUBLE) AS jaccard
        FROM pairs
        JOIN (SELECT doc_id, len(sh) AS na FROM sh_rel) sa ON pairs.a = sa.doc_id
        JOIN (SELECT doc_id, len(sh) AS nb FROM sh_rel) sb ON pairs.b = sb.doc_id"""

  private def sqlVerifyPairs(candsSql: String, threshold: Double): String =
    s"""SELECT a, b, ${T.sqlJaccard("sa.sh", "sb.sh")} AS jaccard
        FROM ($candsSql) c
        JOIN ($sqlShingleDf) sa ON c.a = sa.doc_id
        JOIN ($sqlShingleDf) sb ON c.b = sb.doc_id
        WHERE ${T.sqlJaccard("sa.sh", "sb.sh")} >= $threshold
        ORDER BY a, b"""

  // SRP blocking parameters for q35: 32 hyperplanes, band width DERIVED
  // from the corpus count (adaptiveSrpWidth) — the band layout is a
  // parameter, not a property of the data like q35's old `label`
  // blocking, and deriving it keeps recall scale-invariant instead of
  // merely observable through [[warnIfSrpSaturated]] (which still guards
  // the w=16 ceiling). The SQL twin mirrors the derivation with
  // count-guarded branches, so the gate stays meaningful at any SF.
  private val SrpPlanes = 32
  private val EmbeddingDims = 64

  /** Smallest band width (a divisor of [[SrpPlanes]], 4..16) whose average
    * bucket occupancy n/2^w stays below half the stop-key cap — i.e.
    * width ≈ log2(n / target bucket), stepped to keep planes/width whole.
    * 16 is the ceiling (fewer than 2 bands would kill recall); beyond its
    * saturation point (n ≥ 2^16·cap/2) raise `planes`, which
    * [[warnIfSrpSaturated]] will point out. */
  private[graft] def adaptiveSrpWidth(n: Long): Int =
    SrpWidthSteps.find(w => n < srpWidthLimit(w)).getOrElse(SrpWidthSteps.last)
  private[graft] val SrpWidthSteps = Seq(4, 8, 16)
  /** Exclusive corpus-size bound for width `w`: n/2^w < cap/2 (integer). */
  private def srpWidthLimit(w: Int): Long = (1L << w) * (StopShingleCap / 2)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Warn when the fixed band width cannot hold the corpus: with n vectors
    * in 2^width buckets per band, average occupancy n/2^width at or above
    * [[StopShingleCap]] means typical buckets are dropped as stop-keys and
    * near-dup recall degrades toward zero. The count() is a parquet
    * metadata read — no data scan. */
  private def warnIfSrpSaturated(n: Long, width: Int): Unit = {
    val avgBucket = n.toDouble / (1L << width)
    if (avgBucket >= StopShingleCap * 0.5)
      log.warn(
        s"SRP band width $width gives ~${avgBucket.toLong} vectors per bucket " +
          s"for n=$n (stop-key cap $StopShingleCap): candidate buckets are " +
          s"being dropped and near-dup recall is degraded. Use " +
          s"embeddingNearDup with bandWidth >= ${math.ceil(math.log(
            n.toDouble / 64) / math.log(2)).toInt} (≈ log2(n/targetBucket)).")
  }

  /** Parameterized SRP-blocked embedding near-dup — q35's algorithm with a
    * caller-chosen band layout, for corpora where the oracled defaults
    * saturate (see [[warnIfSrpSaturated]]). `planes` must be divisible by
    * `bandWidth`; recall rises with more bands, precision of the blocking
    * with wider bands. */
  def embeddingNearDup(s: SparkSession, d: String, planes: Int,
      bandWidth: Int, threshold: Double): DataFrame = {
    require(planes % bandWidth == 0, "planes must be a multiple of bandWidth")
    val nBands = planes / bandWidth
    val e = Tables.embeddings(s, d)
    warnIfSrpSaturated(e.count(), bandWidth)
    val sig = e.select(col("vec_id"), VectorExpressions.srpSignature(
      col("embedding"), planes, EmbeddingDims).as("sig"))
    val banded = sig.select(col("vec_id").as("id"),
      posexplode(array((0 until nBands).map(b =>
        substring(col("sig"), b * bandWidth + 1, bandWidth)): _*))
      .as(Seq("band_idx", "bk")))
    val cands = unpack(
      cappedPackedPairs(banded, Seq(col("band_idx"), col("bk"))).distinct())
    // both vector-fetch joins key on vec_id over the SAME relation:
    // derive them from one vec_id-partitioned base so the two embedding
    // exchanges collapse into a single reused shuffle (optimization
    // round 17, guide §2.4)
    val eP = e.select(col("vec_id"), col("embedding"))
      .repartition(col("vec_id"))
    cands
      .join(eP.select(col("vec_id").as("a"), col("embedding").as("va")), "a")
      .join(eP.select(col("vec_id").as("b"), col("embedding").as("vb")), "b")
      .select(col("a"), col("b"), V.cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy(col("a"), col("b"))
  }

  /** q170 winnowing parameters: k-gram size (tokens per gram), window
    * width (grams per window), max fingerprint document frequency (the
    * StopShingleCap analog — a fingerprint shared by more docs than this
    * is boilerplate, not evidence), and the min shared-fingerprint count
    * for a reported pair. Mirrored verbatim in the oracle twin. */
  val WinnowK = 4
  val WinnowW = 4
  val WinnowDfCap = 64
  val WinnowMinShared = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // WINNOWING document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    // 2003 — the MOSS algorithm, public): hash every k-gram, slide a
    // w-hash window, keep each window's MINIMUM hash; the selected-value
    // set is the doc's fingerprint. Guarantees every shared run of
    // k+w-1 tokens yields at least one shared fingerprint (the paper's
    // coverage property) while storing ~2/(w+1) of the hashes — the
    // storage/recall trade fixed 8-gram span profiling (q135/q157)
    // doesn't offer. Pairs sharing ≥ WinnowMinShared fingerprints are
    // reported. Shape at scale: the per-doc window min is doc-local (one
    // exchange on doc_id, no corpus pair relation); the cross-doc join is
    // an inverted-index join on the fingerprint VALUE with a df cap —
    // shuffles O(docs × fingerprints), never O(docs²), and a boilerplate
    // fingerprint shared by > WinnowDfCap docs is dropped as a stop-key
    // exactly like [[StopShingleCap]].
    "q170_winnow_fingerprint" -> ((s, d) => {
      // per-doc fingerprint SETS from the single-pass compiled expression
      // (hash → window-min → distinct, all doc-local): the corpus-wide
      // pass is one scan + one explode of the ~2/(w+1)-compressed arrays,
      // with no positional posexplode and no per-doc window shuffle —
      // equivalence to the composed window form pinned in PlansSpec.
      // RelationCache'd: the fingerprint relation IS the MOSS index (a
      // persisted artifact in production), and the df filter + both
      // sides of the pair join read it — one materialization instead of
      // three corpus re-fingerprints
      // cached PRE-PARTITIONED on fp (optimization round 17, the q164
      // edge-cache rule): the df aggregation below groups this relation
      // by fp, so the serving pass runs exchange-free on the cached
      // partitioning instead of re-shuffling the index per run
      val fps = graft.sources.RelationCache.of(s, "dedup.winnowFps", d) {
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(TextExpressions.winnowFps(col("text"), WinnowK, WinnowW)).as("fp"))
          .repartition(col("fp"))
      }
      // pair counts via the family's packed-pair shape (optimization
      // round 17, guide §2.3/§2.4): the previous form joined the rare
      // set back and SELF-JOINED the index on fp (two more shuffles of
      // the fp relation + the join fan-out); one collect_list over the
      // already-fp-partitioned cache + the compiled PackedPairs
      // expression emits the identical (a<b, shared-count) relation —
      // df ∈ [2, cap] becomes the posting-list size filter, and pair
      // counts partial-aggregate map-side. Results identical: same
      // pairs, same counts, same ordering rule. Measured: 0.70 s →
      // 0.48 s isolated, 2 jobs (was 7).
      fps.groupBy(col("fp"))
        .agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")).between(2, WinnowDfCap))
        .select(explode(TextExpressions.packedPairs(col("ds"))).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= WinnowMinShared)
        .withColumn("a", shiftrightunsigned(col("pk"), 32))
        .withColumn("b", col("pk").bitwiseAND(0xffffffffL))
        .select(col("a"), col("b"), col("n_shared"))
        .orderBy(desc("n_shared"), col("a"), col("b"))
        .limit(100)
    }),

    // Exact dedup: keep the FIRST event per (user, event_type) — a rank-1
    // window, deterministic survivor (dropDuplicates is not).
    "q31_exact_dedup" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // MinHash + LSH banded near-dup: 16 MIXED minhash components (one md5
    // per shingle + Carter-Wegman per-seed mixing — 16× less hashing than
    // per-seed md5) → 8 bands × 2 rows; candidates share a band; verified
    // with exact shingle Jaccard ≥ 0.5.
    "q32_minhash_lsh" -> ((s, d) => {
      val cands = lshCandidatePairs(s, d)
      // verify ONLY the candidates (bounded by band collisions — tiny),
      // so exact per-pair array Jaccard is cheap here; numerically equal
      // to the intersection-count form used by q34 on uncapped corpora.
      val sh = shingleDf(s, d)
      cands
        .join(sh.select(col("doc_id").as("a"), col("sh").as("sh_a")), "a")
        .join(sh.select(col("doc_id").as("b"), col("sh").as("sh_b")), "b")
        .select(col("a"), col("b"), T.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("a"), col("b"))
    }),

    // SimHash 16-bit fingerprint buckets: docs whose distinct-token sets
    // hash to the same signature (candidate near-dups at the set level).
    "q33_simhash" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), TextExpressions.simhash16(col("text")).as("simhash"))
        .groupBy(col("simhash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .filter(col("n_docs") > 1)
        .orderBy(col("simhash"))
    }),

    // N-gram Jaccard near-dup via inverted shingle index (no cross join):
    // candidate pairs share ≥1 non-hot shingle; Jaccard from shared counts.
    "q34_ngram_jaccard" -> ((s, d) => {
      dupPairs(s, d).orderBy(col("a"), col("b"))
    }),

    // LSH BANDING-QUALITY eval: candidates from the 8×2 MinHash banding
    // vs the exact capped-inverted-index truth (Jaccard ≥ 0.5) — the
    // measured precision/recall that justifies the banding parameters,
    // as green numbers instead of an S-curve claim. recall < 1 exposes
    // true pairs whose signatures never collide in any band; precision
    // is the verify-stage workload per kept pair. All three counts ride
    // relations other queries already cache; the final frame is three
    // 1-row aggregates cross-joined — nothing corpus-sized moves.
    "q185_lsh_eval" -> ((s, d) => {
      val cand = lshCandidatePairs(s, d).select(col("a"), col("b"))
      val truth = dupPairs(s, d).select(col("a"), col("b"))
      val c = cand.agg(count(lit(1)).as("n_candidates"))
      val t = truth.agg(count(lit(1)).as("n_true"))
      val h = cand.join(truth, Seq("a", "b"))
        .agg(count(lit(1)).as("n_hit"))
      c.crossJoin(t).crossJoin(h)
        .select(col("n_candidates"), col("n_true"), col("n_hit"),
          expr("n_hit * 1000000 div n_candidates").as("precision_micro"),
          expr("n_hit * 1000000 div n_true").as("recall_micro"))
    }),

    // Duplicate CLUSTERS, not just pairs — the RelationCache'd converged
    // connected-components relation (see [[dupClusters]] for the
    // algorithm and cache discipline); q152 reads the same relation.
    "q68_dup_clusters" -> ((s, d) => dupClusters(s, d)),

    // TOKEN YIELD under dedup — the budgeting metric a training run
    // actually consumes: per language, how many TOKENS survive the
    // min-id keep-one-per-cluster policy (q152 counts documents; epochs
    // and mixture math run on tokens). Reads the same converged CC label
    // relation as q68/q152/q155 — one components run per corpus, and the
    // four consumers cannot disagree about what a duplicate is. Shape at
    // scale: the label relation is O(dup docs); the corpus pays one scan
    // with a doc-local token count and a broadcast join against the tiny
    // dropped set.
    "q183_dedup_token_yield" -> ((s, d) => {
      val dropped = dupClusterLabels(s, d)
        .filter(col("doc_id") =!= col("label"))
        .select(col("doc_id"), lit(1L).as("is_dropped"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(graft.plans.TextExpressions.tokens(col("text")))
            .cast("long").as("n_tok"))
        .join(broadcast(dropped), Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("is_dropped"), lit(0L))).as("n_dropped"),
          sum(col("n_tok")).as("tokens_total"),
          sum(when(col("is_dropped").isNull, col("n_tok")).otherwise(0L))
            .as("tokens_kept"))
        .orderBy(col("lang"))
    }),

    // CANONICAL SELECTION per dup cluster — the production keep-policy:
    // a cluster's surviving copy is its BEST-QUALITY member (quality
    // desc, doc_id tie-break), not the lowest id the CC label happens to
    // carry. Reads the same converged label relation as q68/q152 (one CC
    // run per corpus), joins the tiny member set against per-doc quality,
    // and reports per canonical-doc language: clusters, members, and how
    // many clusters changed representative under the quality rule —
    // the audit that says whether min-id keep-first was throwing away
    // better copies.
    "q155_cluster_canonical" -> ((s, d) => {
      val members = dupClusterLabels(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("lang"),
          TextExpressions.qualityScore(col("text")).as("q")), "doc_id")
      members.groupBy(col("label"))
        .agg(count(lit(1)).as("n_members"),
          min(col("doc_id")).as("cluster_rep"),
          min(struct((-col("q")).as("nq"), col("doc_id").as("id"),
            col("lang").as("lg"))).as("m"))
        .filter(col("n_members") > 1)
        .select(col("m.lg").as("lang"), col("n_members"),
          col("cluster_rep"), col("m.id").as("canonical"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("n_members")).as("n_members"),
          sum(when(col("canonical") =!= col("cluster_rep"), 1L).otherwise(0L))
            .as("n_requalified"))
        .orderBy(col("lang"))
    }),

    // Embedding-cosine near-dup, blocked by sign-random-projection LSH
    // bands (deterministic md5-seeded hyperplanes) — NOT by a data column:
    // bucket sizes are governed by the band width, not label cardinality,
    // so no block grows quadratically with corpus skew. The width itself
    // derives from the corpus count (adaptiveSrpWidth), so buckets stay
    // bounded at any SF without retuning. Candidates are verified with
    // exact cosine.
    "q35_embedding_neardup" -> ((s, d) => {
      val n = Tables.embeddings(s, d).count() // parquet metadata read
      embeddingNearDup(s, d, SrpPlanes, adaptiveSrpWidth(n), 0.4)
    }),

    // INCREMENTAL near-dup: an arriving batch (doc_id ≡ 8,9 mod 10) is
    // checked against the EXISTING corpus (the other 80%) only — the
    // production ingest shape: new docs probe the corpus inverted index;
    // no new×new or old×old pairs, and the old index is exactly what a
    // deployed pipeline keeps materialized between batches. Hot shingles
    // are dropped by corpus-side document frequency (the stop-key cap),
    // mirrored in the twin.
    "q110_incremental_neardup" -> ((s, d) => {
      val sh = shingleDf(s, d)
      // (tried in round 17: deriving old/new from ONE shingle-partitioned
      // exploded relation so the df-cap agg and both join sides share an
      // exchange — filter pushdown splits the three subtrees below the
      // repartition, so nothing is reused and the raw explode shuffles
      // THREE times: 3.5 MB → 11.9 MB shuffled, 1.46× slower. Reverted;
      // the partial-aggregated formulation below is the scale shape.)
      val oldInv = sh.filter(col("doc_id") % 10 < 8)
        .select(explode(col("sh")).as("shingle"), col("doc_id").as("old_id"))
      val newInv = sh.filter(col("doc_id") % 10 >= 8)
        .select(explode(col("sh")).as("shingle"), col("doc_id").as("new_id"))
      val okShingles = oldInv.groupBy(col("shingle"))
        .agg(count(lit(1)).as("c")).filter(col("c") < StopShingleCap)
        .select(col("shingle"))
      // Jaccard from shared COUNTS (the q34 shape): the index join's
      // output aggregates straight into per-pair counts with map-side
      // partials — never materializing candidate shingle ARRAYS per pair,
      // which at corpus scale is the difference between a count shuffle
      // and shipping the whole shingle index once per candidate.
      val shared = newInv.join(okShingles, "shingle").join(oldInv, "shingle")
        .groupBy(col("new_id"), col("old_id")).agg(count(lit(1)).as("shared"))
      val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
      shared
        .join(sizes.select(col("doc_id").as("new_id"), col("n").as("nn")), "new_id")
        .join(sizes.select(col("doc_id").as("old_id"), col("n").as("no")), "old_id")
        .select(col("new_id"), col("old_id"), (col("shared").cast("double")
          / (col("nn") + col("no") - col("shared")).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("new_id"), col("old_id"))
    }),

    // Verbatim-SPAN duplication profile (exact-substring dedup signal,
    // Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    // Better"): an 8-token window appearing in ≥2 docs marks verbatim
    // reuse — templated boilerplate, mirrored articles, license headers.
    // Unlike the pairwise family (q32/q34), this is window-DOCUMENT-
    // FREQUENCY based: explode → df per window → join back → per-doc
    // dup fraction. NO pair relation ever exists, so cost is O(token
    // windows) at any corpus scale — the shape production substring
    // dedup actually uses to pick spans to cut. The 0.2 flag threshold
    // compares 5·n_dup ≥ n_win in integers: no doubles anywhere.
    "q135_span_dup" -> ((s, d) =>
      spanDupCounts(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_dup") * 5 >= col("n_win"), 1L).otherwise(0L))
            .as("n_flagged"),
          sum(col("n_dup")).as("dup_windows"),
          sum(col("n_win")).as("total_windows"))
        .orderBy(col("lang"))),

    // SPAN SCRUB accounting — the CUT step q135 only profiles (Lee et al.
    // 2022 §4.1 ExactSubstr): positional 8-token windows whose text
    // recurs in ≥2 distinct docs mark token ranges [pos, pos+7]; the
    // union of those ranges per doc is what substring dedup deletes.
    // Reports, per lang, how much text the scrub removes and in how many
    // contiguous spans (the rewrite's splice count). Everything is
    // integer: covered-position counting replaces interval arithmetic
    // (distinct (doc, p) after an 8× expansion of DUP windows only), and
    // span starts fall out of a lag(1) gaps-and-islands pass riding the
    // same (doc_id, p) shuffle. Cost is O(token windows) + 8× the dup
    // subset — no pair relation, same scale shape as q135; the df filter
    // keeps the expanded relation proportional to actually-duplicated
    // text, which is the quantity being measured.
    // INTER-SOURCE content-overlap matrix: exact shingle-set Jaccard
    // between every pair of SOURCES — the corpus-level diagnostic
    // (which feeds mirror each other; what double-counting a mixture
    // over these sources inherits) next to the doc-level family
    // (q32/q34). Exact, not MinHash-estimated: the distinct
    // (source, shingle) relation is the only corpus-sized shuffle, and
    // the per-shingle fan-out is bounded by the SOURCE COUNT (≤ n_src
    // rows per shingle, ≤ n_src² pairs) — so unlike doc-level pairs,
    // source-level exact intersection is cheap at ANY corpus size; no
    // stop-key cap needed, the schema bounds it. Union sizes come from
    // inclusion-exclusion off the same relation.
    "q168_source_overlap" -> ((s, d) => {
      // cached PRE-PARTITIONED on the group key (optimization round 17,
      // the q164 edge-cache rule): every serving pass groups this
      // corpus-sized relation by `sh`, and a cached plan surfaces its
      // partitioning — so the pass-side aggregation runs exchange-free
      // instead of re-shuffling ~5 MB of shingle strings per run.
      // (A source-bitmask bit_or variant was prototyped and measured
      // SLOWER end-to-end — 2.6 s vs 1.5 s — its extra driver syncs and
      // broadcasts outweighed the cheaper aggregate; discarded.)
      val ss = graft.sources.RelationCache.of(s, "dedup.srcShingles", d) {
        Tables.documents(s, d)
          .select(col("source"),
            explode(TextExpressions.wordShingles(col("text"), 3)).as("sh"))
          .distinct()
          .repartition(col("sh"))
      }
      val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
      // Pair generation WITHOUT the self-join (optimization round 17,
      // guide §2.3/§2.4): the join formulation shuffled/broadcast the
      // corpus-sized relation TWICE keyed on the string shingle
      // (measured 40.6 s of task time at sf0.1 — the suite's worst; at
      // 100 TB the broadcast side is corpus-sized, so that plan
      // degenerates to a double sort-merge of the corpus). This is the
      // [[pairSharedCounts]] shape: group by shingle once, emit the
      // ≤ n_src·(n_src−1)/2 ordered pairs from the in-group sorted
      // source array, partial-aggregate the pair counts map-side to
      // ≤ n_src² rows before the second (tiny) exchange. In-group state
      // is bounded by the SOURCE COUNT, never the corpus — the same
      // schema bound the join relied on. sort_array uses the binary
      // string order of the join's `source < source_b` filter, so the
      // (a, b) orientation and counts are IDENTICAL. (An int-indexed
      // PackedPairs variant was measured slower: the index assignment
      // costs a per-pass driver sync + an O(n_src) probe per row.)
      ss.groupBy(col("sh"))
        .agg(sort_array(collect_list(col("source"))).as("srcs"))
        .filter(size(col("srcs")) >= 2)
        .select(explode(flatten(transform(col("srcs"), (x, i) =>
          transform(slice(col("srcs"), i + 2, size(col("srcs"))),
            y => struct(x.as("source"), y.as("source_b")))))).as("p"))
        .select(col("p.source").as("source"), col("p.source_b").as("source_b"))
        .groupBy(col("source"), col("source_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("source"), col("n").as("na")), "source")
        .join(sizes.select(col("source").as("source_b"), col("n").as("nb")),
          "source_b")
        .select(col("source").as("a"), col("source_b").as("b"), col("inter"),
          (col("na") + col("nb") - col("inter")).as("union_n"),
          (col("inter").cast("double")
            / (col("na") + col("nb") - col("inter")).cast("double"))
            .as("jaccard"))
        .orderBy(col("a"), col("b"))
    }),

    // PAGERANK over the near-dup graph — link-style centrality of
    // duplicated documents (a high-rank doc is the hub of a template
    // family; the doc to inspect when deciding what a cluster really
    // is). The graph is the DERIVED similarity graph (capped LSH
    // candidates — q94 ranks the observed event-transition graph; this
    // ranks a graph the engine itself mined, the curation-side use).
    // Classic damped PageRank (d = 0.85) in EXACT integer fixed
    // point: ranks live in micro-units, neighbor contributions are
    // truncating integer quotients r(v) div deg(v) (≡ DuckDB `//`), so
    // all 3 rounds are bit-reproducible and oracle-checked — the same
    // no-doubles discipline as q158/q160/q163. Nodes are the non-
    // isolated docs (every other doc's rank is the constant background).
    // Shape at scale: the edge relation (capped candidates, both
    // directions) is built once; each round is ONE join + one shuffle
    // aggregate on the same key — textbook iterative-graph Spark, with
    // the iteration count fixed (3) rather than convergence-driven so
    // the oracle can unroll it.
    "q164_dup_pagerank" -> ((s, d) => {
      // the degree-annotated edge relation feeds every round (and the
      // rank init): one materialization per (session, dir), not one
      // recompute per round of every action's replay
      val ed = graft.sources.RelationCache.of(s, "dedup.prEdges", d) {
        val pairs = dupPairs(s, d).select(col("a"), col("b"))
        val edges = pairs.select(col("a").as("u"), col("b").as("v"))
          .union(pairs.select(col("b").as("u"), col("a").as("v")))
        val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        // cache the relation PRE-PARTITIONED AND SORTED on the per-round
        // join key (optimization round 17, guide §2.4): every one of the
        // 3 pagerank rounds joins this relation on `v`, and a cached plan
        // surfaces its child's partitioning/ordering — so each round's
        // sort-merge join exchanges and sorts ONLY the O(nodes) rank side,
        // never the O(edges) relation (before: 3 full edge shuffles/sorts)
        edges.join(deg.select(col("u").as("v"), col("deg").as("deg_v")), "v")
          .repartition(col("v")).sortWithinPartitions(col("v"))
      }
      var rank = ed.select(col("u")).distinct()
        .select(col("u"), lit(1000000L).as("r"))
      for (_ <- 1 to 3) {
        val c = ed.join(rank.select(col("u").as("v"), col("r")), "v")
          .select(col("u"), expr("r div deg_v").as("c"))
          .groupBy(col("u")).agg(sum(col("c")).as("cs"))
        rank = c.select(col("u"),
          (lit(150000L) + expr("(850000 * cs) div 1000000")).as("r"))
      }
      rank.select(col("u").as("doc_id"), col("r").as("pr"))
        .orderBy(col("doc_id"))
    }),

    "q157_span_scrub" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextExpressions.tokens(col("text")).as("toks"))
        .withColumn("n_tok", size(col("toks")).cast("long"))
      // positional windows: start pos (1-based) → space-joined 8 tokens
      val wins = toks.filter(col("n_tok") >= 8)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(1), size(col("toks")) - 7),
            i => concat_ws(" ", slice(col("toks"), i, lit(8)))))
            .as(Seq("p0", "w")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("w"))
      val dupW = wins.select(col("doc_id"), col("w")).distinct()
        .groupBy(col("w")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("w"))
      val covered = wins.join(dupW, "w")
        .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + 7)).as("p"))
        .distinct()
      val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val perDoc = covered
        .withColumn("prev", lag(col("p"), 1).over(wdoc))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("removed"),
          sum(when(col("prev").isNull || col("prev") =!= col("p") - 1, 1L)
            .otherwise(0L)).as("spans"))
      toks.select(col("doc_id"), col("lang"), col("n_tok"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("lang"), col("n_tok"),
          coalesce(col("removed"), lit(0L)).as("removed"),
          coalesce(col("spans"), lit(0L)).as("spans"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          sum(col("removed")).as("removed_tokens"),
          sum(col("n_tok") - col("removed")).as("kept_tokens"),
          sum(col("spans")).as("n_spans"))
        .orderBy(col("lang"))
    }))

  /** Per-doc 8-token-window span-duplication counts (doc_id, lang,
    * source, n_win, n_dup), RelationCache'd per (session, dir): the
    * exploded-window df aggregation is the suite's biggest token shuffle,
    * and BOTH q135 (the span profile) and q141 (the curation pipeline's
    * dedup stage) consume exactly this relation — one materialization
    * instead of two.
    *
    * The per-doc window count comes FREE from the shingle array size —
    * only the dup count needs the window df, and only windows with df ≥ 2
    * (a few % of the gram space) flow back: the join's build side is the
    * shared-window set, not the full vocabulary. (doc_id, w) is already
    * distinct (WordShingles dedupes per doc), so plain count IS the
    * document frequency — no second dedup aggregate. */
  private[graft] def spanDupCounts(s: SparkSession, d: String): DataFrame =
    graft.sources.RelationCache.of(s, "dedup.spanDups", d) {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          TextExpressions.wordShingles(col("text"), 8).as("sh"))
        .filter(size(col("sh")) > 0)
      val win = docs.select(col("doc_id"), explode(col("sh")).as("w"))
      val sharedW = win.groupBy(col("w"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("w"))
      val dups = win.join(sharedW, "w")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
      docs.select(col("doc_id"), col("lang"), col("source"),
          size(col("sh")).cast("long").as("n_win"))
        .join(dups, Seq("doc_id"), "left")
        .withColumn("n_dup", coalesce(col("n_dup"), lit(0L)))
    }

  def oracle: Map[String, String] = Map(
    "q170_winnow_fingerprint" -> {
      val gram = (0 until WinnowK).map(j =>
        if (j == 0) "toks[i]" else s"toks[i + $j]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, ${T.sqlToks} AS toks FROM documents),
          g AS (SELECT doc_id, unnest(hs) AS h,
                  generate_subscripts(hs, 1) AS pos, len(hs) AS m
                FROM (SELECT doc_id,
                        [${T.sqlMd5Prefix(gram, 8)}
                          FOR i IN range(1, len(toks) - ${WinnowK - 2})] AS hs
                      FROM t)
                WHERE len(hs) >= $WinnowW),
          w AS (SELECT doc_id, pos, m, min(h) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS fp
                FROM g),
          fps AS (SELECT DISTINCT doc_id, fp FROM w
                  WHERE pos <= m - $WinnowW + 1),
          rare AS (SELECT fp FROM fps GROUP BY fp
                   HAVING count(*) BETWEEN 2 AND $WinnowDfCap)
          SELECT x.doc_id AS a, y.doc_id AS b,
            CAST(count(*) AS BIGINT) AS n_shared
          FROM fps x JOIN rare USING (fp) JOIN fps y USING (fp)
          WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2 HAVING count(*) >= $WinnowMinShared
          ORDER BY n_shared DESC, a, b LIMIT 100"""
    },

    "q31_exact_dedup" ->
      """SELECT user_id, event_type, event_id AS first_event_id FROM (
           SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id, event_type""",

    "q32_minhash_lsh" -> sqlVerifyPairs(sqlLshCandidates, 0.5),

    "q185_lsh_eval" ->
      s"""WITH cand AS ($sqlLshCandidates),
          truth AS (SELECT a, b FROM (${sqlCappedCountJaccard(sqlShingleDf)})
                    WHERE jaccard >= 0.5),
          hit AS (SELECT CAST(count(*) AS BIGINT) AS n
                  FROM cand JOIN truth USING (a, b))
          SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
            CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
            (SELECT n FROM hit) AS n_hit,
            CAST((SELECT n FROM hit) * 1000000
              // (SELECT count(*) FROM cand) AS BIGINT) AS precision_micro,
            CAST((SELECT n FROM hit) * 1000000
              // (SELECT count(*) FROM truth) AS BIGINT) AS recall_micro""",

    "q33_simhash" ->
      s"""SELECT simhash, count(*) AS n_docs, min(doc_id) AS keeper
          FROM (SELECT doc_id, ${T.sqlSimhash16("ts")} AS simhash
                FROM (SELECT doc_id, ${T.sqlTokSet} AS ts FROM documents))
          GROUP BY simhash HAVING count(*) > 1 ORDER BY simhash""",

    "q34_ngram_jaccard" ->
      s"""SELECT a, b, jaccard FROM (${sqlCappedCountJaccard(sqlShingleDf)})
          WHERE jaccard >= 0.5 ORDER BY a, b""",

    "q68_dup_clusters" ->
      s"""WITH RECURSIVE
          pairs AS (SELECT a, b FROM (${sqlCappedCountJaccard(sqlShingleDf)})
                    WHERE jaccard >= 0.5),
          edges AS (SELECT a AS src, b AS dst FROM pairs
                    UNION ALL SELECT b AS src, a AS dst FROM pairs),
          nodes AS (SELECT doc_id FROM ($sqlShingleDf)),
          walk AS (
            SELECT doc_id, doc_id AS label FROM nodes
            UNION
            SELECT e.src AS doc_id, w.label
            FROM walk w JOIN edges e ON w.doc_id = e.dst)
          SELECT cluster_rep, count(*) AS n_members FROM (
            SELECT doc_id, min(label) AS cluster_rep FROM walk GROUP BY doc_id)
          GROUP BY cluster_rep HAVING count(*) > 1 ORDER BY cluster_rep""",

    // q68's label walk, then tokens attributed kept/dropped by the
    // min-id keep policy (doc_id <> its component min ⇒ dropped)
    "q183_dedup_token_yield" ->
      s"""WITH RECURSIVE
          pairs AS (SELECT a, b FROM (${sqlCappedCountJaccard(sqlShingleDf)})
                    WHERE jaccard >= 0.5),
          edges AS (SELECT a AS src, b AS dst FROM pairs
                    UNION ALL SELECT b AS src, a AS dst FROM pairs),
          nodes AS (SELECT doc_id FROM ($sqlShingleDf)),
          walk AS (
            SELECT doc_id, doc_id AS label FROM nodes
            UNION
            SELECT e.src AS doc_id, w.label
            FROM walk w JOIN edges e ON w.doc_id = e.dst),
          dropped AS (SELECT doc_id FROM (
              SELECT doc_id, min(label) AS rep FROM walk GROUP BY doc_id)
            WHERE doc_id <> rep),
          tok AS (SELECT doc_id, lang,
              CAST(len(${graft.functions.TextFunctions.sqlToks}) AS BIGINT) AS n_tok
            FROM documents)
          SELECT t.lang, count(*) AS n_docs,
            CAST(sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_dropped,
            CAST(sum(t.n_tok) AS BIGINT) AS tokens_total,
            CAST(sum(CASE WHEN dr.doc_id IS NULL THEN t.n_tok ELSE 0 END)
              AS BIGINT) AS tokens_kept
          FROM tok t LEFT JOIN dropped dr USING (doc_id)
          GROUP BY t.lang ORDER BY t.lang""",

    // q68's label walk, then the rn=1 row per cluster under (quality
    // desc, doc_id) — its lang IS the canonical's lang
    "q155_cluster_canonical" ->
      s"""WITH RECURSIVE
          pairs AS (SELECT a, b FROM (${sqlCappedCountJaccard(sqlShingleDf)})
                    WHERE jaccard >= 0.5),
          edges AS (SELECT a AS src, b AS dst FROM pairs
                    UNION ALL SELECT b AS src, a AS dst FROM pairs),
          nodes AS (SELECT doc_id FROM ($sqlShingleDf)),
          walk AS (
            SELECT doc_id, doc_id AS label FROM nodes
            UNION
            SELECT e.src AS doc_id, w.label
            FROM walk w JOIN edges e ON w.doc_id = e.dst),
          labels AS (SELECT doc_id, min(label) AS label FROM walk GROUP BY doc_id),
          members AS (
            SELECT l.label, l.doc_id, d.lang,
              0.5 * (1.0 - CAST(len(list_filter(toks, t -> t IN ('a','the','of','and','to','in'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
              + 0.5 * least(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) / 8.0, 1.0) AS q
            FROM labels l JOIN (
              SELECT doc_id, lang, ${T.sqlToks} AS toks FROM documents) d
              ON l.doc_id = d.doc_id),
          canon AS (
            SELECT lang, n_members, cluster_rep, doc_id AS canonical FROM (
              SELECT m.*, count(*) OVER (PARTITION BY label) AS n_members,
                min(doc_id) OVER (PARTITION BY label) AS cluster_rep,
                row_number() OVER (PARTITION BY label
                  ORDER BY q DESC, doc_id) AS rn
              FROM members m) WHERE rn = 1 AND n_members > 1)
          SELECT lang, count(*) AS n_clusters,
            CAST(sum(n_members) AS BIGINT) AS n_members,
            CAST(sum(CASE WHEN canonical <> cluster_rep THEN 1 ELSE 0 END)
              AS BIGINT) AS n_requalified
          FROM canon GROUP BY lang ORDER BY lang""",

    "q110_incremental_neardup" ->
      s"""SELECT new_id, old_id, jaccard FROM (
            WITH sh_rel AS ($sqlShingleDf),
            oldinv AS (SELECT doc_id AS old_id, unnest(sh) AS shingle
                       FROM sh_rel WHERE doc_id % 10 < 8),
            newinv AS (SELECT doc_id AS new_id, unnest(sh) AS shingle
                       FROM sh_rel WHERE doc_id % 10 >= 8),
            ok AS (SELECT shingle FROM oldinv
                   GROUP BY shingle HAVING count(*) < $StopShingleCap),
            pairs AS (SELECT new_id, old_id, count(*) AS shared
                      FROM newinv JOIN ok USING (shingle)
                                  JOIN oldinv USING (shingle)
                      GROUP BY new_id, old_id)
            SELECT new_id, old_id, CAST(shared AS DOUBLE)
              / CAST(nn + no - shared AS DOUBLE) AS jaccard
            FROM pairs
            JOIN (SELECT doc_id, len(sh) AS nn FROM sh_rel) a ON pairs.new_id = a.doc_id
            JOIN (SELECT doc_id, len(sh) AS no FROM sh_rel) b ON pairs.old_id = b.doc_id)
          WHERE jaccard >= 0.5 ORDER BY new_id, old_id""",

    "q135_span_dup" ->
      s"""WITH t AS (SELECT doc_id, lang, ${T.sqlToks} AS toks FROM documents),
          win AS (SELECT doc_id, lang,
                    unnest(list_distinct([list_aggr(toks[i:i+7], 'string_agg', ' ')
                      FOR i IN range(1, len(toks) - 6)])) AS w
                  FROM t WHERE len(toks) >= 8),
          wdf AS (SELECT w, count(DISTINCT doc_id) AS df FROM win GROUP BY w),
          per AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_win,
                    CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
                  FROM win JOIN wdf USING (w) GROUP BY doc_id, lang)
          SELECT lang, count(*) AS n_docs,
            CAST(sum(CASE WHEN n_dup * 5 >= n_win THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
            CAST(sum(n_dup) AS BIGINT) AS dup_windows,
            CAST(sum(n_win) AS BIGINT) AS total_windows
          FROM per GROUP BY lang ORDER BY lang""",

    "q168_source_overlap" ->
      s"""WITH ss AS (SELECT DISTINCT source, w AS sh FROM (
                 SELECT source, unnest([list_aggr(toks[i:i+2], 'string_agg', ' ')
                   FOR i IN range(1, len(toks) - 1)]) AS w
                 FROM (SELECT source, ${T.sqlToks} AS toks FROM documents)
                 WHERE len(toks) >= 3)),
          sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                    FROM ss GROUP BY source),
          pairs AS (SELECT x.source AS a, y.source AS b,
                      CAST(count(*) AS BIGINT) AS inter
                    FROM ss x JOIN ss y ON x.sh = y.sh AND x.source < y.source
                    GROUP BY 1, 2)
          SELECT a, b, inter, na + nb - inter AS union_n,
            CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
          FROM pairs
          JOIN (SELECT source AS a, n AS na FROM sizes) USING (a)
          JOIN (SELECT source AS b, n AS nb FROM sizes) USING (b)
          ORDER BY a, b""",

    // the same 3 damped rounds as the Spark side, unrolled; `//` is the
    // truncating twin of Spark's `div`
    "q164_dup_pagerank" -> {
      val rounds = (1 to 3).map { r =>
        s"""r$r AS (SELECT ed.u,
               CAST(150000 + (850000 * sum(r${r - 1}.r // ed.deg_v)) // 1000000
                 AS BIGINT) AS r
             FROM ed JOIN r${r - 1} ON ed.v = r${r - 1}.u GROUP BY ed.u)"""
      }.mkString(",\n          ")
      s"""WITH prs AS (SELECT a, b FROM (${sqlCappedCountJaccard(sqlShingleDf)})
                       WHERE jaccard >= 0.5),
          edges AS (SELECT a AS u, b AS v FROM prs
                    UNION ALL SELECT b AS u, a AS v FROM prs),
          deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
                  FROM edges GROUP BY u),
          ed AS (SELECT e.u, e.v, d.deg AS deg_v
                 FROM edges e JOIN deg d ON e.v = d.u),
          r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS r FROM deg),
          $rounds
          SELECT u AS doc_id, r AS pr FROM r3 ORDER BY doc_id"""
    },

    "q157_span_scrub" ->
      s"""WITH t AS (SELECT doc_id, lang, ${T.sqlToks} AS toks FROM documents),
          base AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tok, toks FROM t),
          wins AS (SELECT doc_id,
                     CAST(unnest(range(1, len(toks) - 6)) AS BIGINT) AS pos,
                     unnest(list_transform(range(1, len(toks) - 6),
                       i -> array_to_string(toks[i:i+7], ' '))) AS w
                   FROM base WHERE n_tok >= 8),
          dupw AS (SELECT w FROM (SELECT DISTINCT doc_id, w FROM wins)
                   GROUP BY w HAVING count(*) >= 2),
          cov AS (SELECT DISTINCT doc_id, p FROM (
                    SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS p
                    FROM wins WHERE w IN (SELECT w FROM dupw))),
          perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS removed,
                       CAST(sum(CASE WHEN prev IS NULL OR prev <> p - 1
                                     THEN 1 ELSE 0 END) AS BIGINT) AS spans
                     FROM (SELECT doc_id, p,
                             lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
                           FROM cov)
                     GROUP BY doc_id)
          SELECT lang, count(*) AS n_docs,
            CAST(sum(n_tok) AS BIGINT) AS total_tokens,
            CAST(sum(COALESCE(removed, 0)) AS BIGINT) AS removed_tokens,
            CAST(sum(n_tok - COALESCE(removed, 0)) AS BIGINT) AS kept_tokens,
            CAST(sum(COALESCE(spans, 0)) AS BIGINT) AS n_spans
          FROM base LEFT JOIN perdoc USING (doc_id)
          GROUP BY lang ORDER BY lang""",

    "q35_embedding_neardup" -> {
      val sigExpr = VectorExpressions.sqlSrpSignature(SrpPlanes, EmbeddingDims, "embedding")
      // mirror adaptiveSrpWidth: each width's band branches carry a guard
      // on the corpus count, so exactly one width's branches produce rows
      // — the twin derives the SAME layout from the SAME rule at any SF
      def widthGuard(w: Int): String = {
        val lo = SrpWidthSteps.takeWhile(_ < w).lastOption
          .map(prev => s"(SELECT c FROM nrows) >= ${(1L << prev) * (StopShingleCap / 2)} AND ")
          .getOrElse("")
        val hi = if (w == SrpWidthSteps.last) ""
          else s"(SELECT c FROM nrows) < ${(1L << w) * (StopShingleCap / 2)}"
        val g = lo + hi
        if (g.endsWith(" AND ")) g.stripSuffix(" AND ") else g
      }
      val cand = SrpWidthSteps.flatMap { w =>
        def band(alias: String, b: Int): String =
          s"substr($alias.sig, ${b * w + 1}, $w)"
        val guard = widthGuard(w)
        (0 until SrpPlanes / w).map { b =>
          s"""SELECT x.vec_id AS a, y.vec_id AS b
              FROM sigs x JOIN sigs y
              ON ${band("x", b)} = ${band("y", b)} AND x.vec_id < y.vec_id
              WHERE ($guard) AND ${band("x", b)} IN (
                SELECT bk FROM (SELECT substr(sig, ${b * w + 1}, $w) AS bk
                                FROM sigs)
                GROUP BY bk HAVING count(*) < $StopShingleCap)"""
        }
      }.mkString(" UNION ALL ")
      s"""WITH sigs AS (SELECT vec_id, embedding, $sigExpr AS sig FROM embeddings),
          nrows AS (SELECT count(*) AS c FROM embeddings),
          cands AS (SELECT DISTINCT a, b FROM ($cand))
          SELECT a, b, ${V.sqlCosine("x.embedding", "y.embedding")} AS sim
          FROM cands JOIN sigs x ON cands.a = x.vec_id
                     JOIN sigs y ON cands.b = y.vec_id
          WHERE ${V.sqlCosine("x.embedding", "y.embedding")} >= 0.4
          ORDER BY a, b"""
    })
}
