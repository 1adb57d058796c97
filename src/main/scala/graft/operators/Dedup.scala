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
    * a tiny vocab, so token *sets* saturate; shingles don't). */
  private def shingleDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), array_distinct(T.shingles(T.tokens(col("text")), 3)).as("sh"))

  private val sqlShingleDf =
    s"""SELECT doc_id, list_distinct([list_aggr(toks[i:i+2], 'string_agg', ' ')
          FOR i IN range(1, len(toks) - 1)]) AS sh
        FROM (SELECT doc_id, ${T.sqlToks} AS toks FROM documents)
        WHERE len(toks) >= 3"""

  private def jaccard(a: Column, b: Column): Column = T.jaccard(a, b)

  /** Exact Jaccard verification of candidate (a,b) pairs against the
    * shingle sets, keeping pairs ≥ threshold. */
  private def verifyPairs(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val A = sh.select(col("doc_id").as("a"), col("sh").as("sh_a"))
    val B = sh.select(col("doc_id").as("b"), col("sh").as("sh_b"))
    cands.join(A, "a").join(B, "b")
      .select(col("a"), col("b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("a"), col("b"))
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
    // candidates share a band; verified with exact shingle Jaccard ≥ 0.5.
    "q32_minhash_lsh" -> ((s, d) => {
      val sh = shingleDf(s, d)
      val bands = sh.select(col("doc_id") +: (0 until 8).map(b =>
        T.minhashBand(col("sh"), b, 2).as(s"band$b")): _*)
      val cands = (0 until 8).map { b =>
        val L = bands.select(col("doc_id").as("a"), col(s"band$b").as("bk"))
        val R = bands.select(col("doc_id").as("b"), col(s"band$b").as("bk"))
        L.join(R, "bk").filter(col("a") < col("b")).select(col("a"), col("b"))
      }.reduce(_ union _).distinct()
      verifyPairs(cands, sh, 0.5)
    }),

    // SimHash 16-bit fingerprint buckets: docs whose distinct-token sets
    // hash to the same signature (candidate near-dups at the set level).
    "q33_simhash" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), T.simhash16(T.tokenSet(col("text"))).as("simhash"))
        .groupBy(col("simhash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .filter(col("n_docs") > 1)
        .orderBy(col("simhash"))
    }),

    // N-gram Jaccard near-dup via inverted shingle index (no cross join):
    // candidate pairs share ≥1 shingle, then exact Jaccard ≥ 0.5.
    "q34_ngram_jaccard" -> ((s, d) => {
      val sh = shingleDf(s, d)
      val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val cands = inv.as("x").join(inv.as("y"), "shingle")
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      verifyPairs(cands, sh, 0.5)
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
