package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.sources.Tables

/** Deduplication operators (north-star mandate; generalizes the reference's
  * distinct-accumulation for citations, `app/app.py:111-124`).
  *
  * Scale design notes:
  *  - exact dedup = one shuffle on the dedup key with a rank-1 window (NOT
  *    `dropDuplicates`, whose survivor row is nondeterministic);
  *  - near-dup never does an all-pairs cross join: candidates come from an
  *    inverted-index join (shared shingle) or MinHash-band bucketing, both of
  *    which shuffle O(docs × shingles) instead of O(docs²);
  *  - all hashes are md5 hex (engine-portable); MinHash takes the
  *    lexicographic min of seeded md5s — a valid min-wise permutation proxy;
  *  - the doc→shingle-set side is small relative to the corpus (distinct
  *    token shingles), so the verify join broadcasts at bench scale and
  *    shuffles cleanly beyond it.
  */
object Dedup {
  /** 3-gram word shingles of the doc text (order-sensitive — the corpus has
    * a tiny vocab, so token *sets* saturate; shingles don't). Uses the
    * compiled single-pass expression (graft.plans.TextExpressions); the
    * built-in HOF form it replaces is TextFunctions.shingles — identical
    * output, ~100× less per-row interpretation. */
  private def shingleDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), graft.plans.TextExpressions.wordShingles(col("text"), 3).as("sh"))

  private val sqlShingleDf =
    s"""SELECT doc_id, list_distinct([list_aggr(toks[i:i+2], 'string_agg', ' ')
          FOR i IN range(1, len(toks) - 1)]) AS sh
        FROM (SELECT doc_id, ${T.sqlToks} AS toks FROM documents)
        WHERE len(toks) >= 3"""

  /** Exact pairwise Jaccard for every pair sharing ≥1 shingle, via the
    * inverted index: explode→self-join→count gives |A∩B| directly (shingle
    * arrays are distinct), so J = i / (|A|+|B|-i) needs NO per-pair array
    * intersection — the candidate verify collapses to one count aggregate
    * plus two broadcast joins against the per-doc set sizes. Numerically
    * identical to size(intersect)/size(union): both are exact-int ratios. */
  /** Shared-shingle counts per candidate pair WITHOUT a self-join:
    * groupBy(shingle) collects the (sorted) posting list, a compiled
    * expression emits every (a<<32|b) pair packed in one long, and a single
    * hash agg counts them. One shuffle of the inverted index replaces the
    * sort-merge of the index against itself. Packing assumes ids < 2^32 —
    * beyond that (never at these SFs) swap the packed explode for the
    * equivalent inv⋈inv join on shingle; everything downstream is
    * unchanged. */
  private[operators] def pairSharedCounts(inv: DataFrame): DataFrame =
    inv.groupBy(col("shingle")).agg(collect_list(col("doc_id")).as("ds"))
      .select(explode(graft.plans.TextExpressions.packedPairs(col("ds"))).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("shared"))
      .select(shiftright(col("pk"), 32).as("a"),
        col("pk").bitwiseAND(0xffffffffL).as("b"), col("shared"))

  private def pairJaccard(s: SparkSession, d: String): DataFrame = {
    val sh = shingleDf(s, d)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    pairSharedCounts(inv)
      .join(broadcast(sizes.select(col("doc_id").as("a"), col("n").as("na"))), "a")
      .join(broadcast(sizes.select(col("doc_id").as("b"), col("n").as("nb"))), "b")
      .select(col("a"), col("b"), (col("shared").cast("double")
        / (col("na") + col("nb") - col("shared")).cast("double")).as("jaccard"))
  }

  private def sqlVerifyPairs(candsSql: String, threshold: Double): String =
    s"""SELECT a, b, ${T.sqlJaccard("sa.sh", "sb.sh")} AS jaccard
        FROM ($candsSql) c
        JOIN ($sqlShingleDf) sa ON c.a = sa.doc_id
        JOIN ($sqlShingleDf) sb ON c.b = sb.doc_id
        WHERE ${T.sqlJaccard("sa.sh", "sb.sh")} >= $threshold
        ORDER BY a, b"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // MinHash + LSH banded near-dup: 16 md5-minhashes → 8 bands × 2 rows;
    // candidates share a band; verified with exact shingle Jaccard ≥ 0.5
    // (via the intersection-count join, not per-pair array ops).
    "q32_minhash_lsh" -> ((s, d) => {
      // One long-format (doc, band_idx, band_key) relation: the 16-component
      // signature is computed ONCE per doc and exploded into 8 band keys;
      // the candidate self-join shuffles on (band_idx, key) so both sides
      // share one canonical exchange (ReuseExchange) instead of 8 joins
      // re-evaluating the signature.
      val sig = shingleDf(s, d)
        .withColumn("sig", graft.plans.TextExpressions.minhashSig(col("sh"), 16))
      val banded = sig.select(col("doc_id"), posexplode(array((0 until 8).map(b =>
        concat(element_at(col("sig"), 2 * b + 1), element_at(col("sig"), 2 * b + 2))): _*))
        .as(Seq("band_idx", "bk")))
      // candidate pairs per band bucket via the packed-pairs aggregation
      // (see pairSharedCounts): one shuffle of the banded relation and ONE
      // evaluation of the 16-component signature, instead of a self-join
      // whose two sides each recompute every md5.
      val cands = banded.groupBy(col("band_idx"), col("bk"))
        .agg(collect_list(col("doc_id")).as("ds"))
        .select(explode(graft.plans.TextExpressions.packedPairs(col("ds"))).as("pk"))
        .distinct()
        .select(shiftright(col("pk"), 32).as("a"),
          col("pk").bitwiseAND(0xffffffffL).as("b"))
      // verify ONLY the candidates (bounded by band collisions — tiny),
      // so exact per-pair array Jaccard is cheap here; numerically equal
      // to the intersection-count form used by q34.
      val sh = shingleDf(s, d)
      cands
        .join(broadcast(sh.select(col("doc_id").as("a"), col("sh").as("sh_a"))), "a")
        .join(broadcast(sh.select(col("doc_id").as("b"), col("sh").as("sh_b"))), "b")
        .select(col("a"), col("b"), T.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("a"), col("b"))
    }),

    // SimHash 16-bit fingerprint buckets: docs whose distinct-token sets
    // hash to the same signature (candidate near-dups at the set level).
    "q33_simhash" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), graft.plans.TextExpressions.simhash16(col("text")).as("simhash"))
        .groupBy(col("simhash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .filter(col("n_docs") > 1)
        .orderBy(col("simhash"))
    }),

    // N-gram Jaccard near-dup via inverted shingle index (no cross join):
    // candidate pairs share ≥1 shingle; exact Jaccard from shared counts.
    "q34_ngram_jaccard" -> ((s, d) => {
      pairJaccard(s, d)
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("a"), col("b"))
    }),

    // Embedding-cosine near-dup, blocked by label (the natural partition
    // key); at scale the blocking column bounds each join cell.
    "q35_embedding_neardup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val L = e.select(col("label"), col("vec_id").as("a"), col("embedding").as("va"))
      val R = e.select(col("label"), col("vec_id").as("b"), col("embedding").as("vb"))
      L.join(R, "label").filter(col("a") < col("b"))
        .select(col("a"), col("b"), V.cosine(col("va"), col("vb")).as("sim"))
        .filter(col("sim") >= 0.4)
        .orderBy(col("a"), col("b"))
    }))

  def oracle: Map[String, String] = Map(
    "q31_exact_dedup" ->
      """SELECT user_id, event_type, event_id AS first_event_id FROM (
           SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id, event_type""",

    "q32_minhash_lsh" -> {
      def bandSql(alias: String, b: Int): String =
        (0 until 2).map(j => T.sqlMinhash(s"$alias.sh", b * 2 + j)).mkString(" || ")
      val cand = (0 until 8).map { b =>
        s"""SELECT x.doc_id AS a, y.doc_id AS b
            FROM ($sqlShingleDf) x JOIN ($sqlShingleDf) y
            ON (${bandSql("x", b)}) = (${bandSql("y", b)}) AND x.doc_id < y.doc_id"""
      }.mkString("SELECT DISTINCT a, b FROM (", " UNION ALL ", ")")
      sqlVerifyPairs(cand, 0.5)
    },

    "q33_simhash" -> {
      val bits = (0 until 16).map { j =>
        s"""CASE WHEN list_sum(list_transform(ts, t ->
            CASE WHEN substring(md5(t), ${j + 1}, 1) IN ('8','9','a','b','c','d','e','f')
            THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"""
      }.mkString(" || ")
      s"""SELECT simhash, count(*) AS n_docs, min(doc_id) AS keeper
          FROM (SELECT doc_id, $bits AS simhash
                FROM (SELECT doc_id, ${T.sqlTokSet} AS ts FROM documents))
          GROUP BY simhash HAVING count(*) > 1 ORDER BY simhash"""
    },

    "q34_ngram_jaccard" -> sqlVerifyPairs(
      s"""SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM (SELECT doc_id, unnest(sh) AS shingle FROM ($sqlShingleDf)) x
          JOIN (SELECT doc_id, unnest(sh) AS shingle FROM ($sqlShingleDf)) y
          ON x.shingle = y.shingle AND x.doc_id < y.doc_id""", 0.5),

    "q35_embedding_neardup" ->
      s"""SELECT x.vec_id AS a, y.vec_id AS b,
          ${V.sqlCosine("x.embedding", "y.embedding")} AS sim
          FROM embeddings x JOIN embeddings y
            ON x.label = y.label AND x.vec_id < y.vec_id
          WHERE ${V.sqlCosine("x.embedding", "y.embedding")} >= 0.4
          ORDER BY a, b""")
}
