package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{VectorFunctions => V}
import graft.sources.Tables

/** Similarity search over the embedding column (north-star mandate;
  * generalizes the reference's managed top-k ANN, `app/vector_search.py:29-33`).
  *
  * Two tiers, as a real 100 TB pipeline would have:
  *  - brute-force exact top-k: scored scan + per-partition partial top-k
  *    (`TakeOrderedAndProject` / rank-window per query) — the correctness
  *    baseline and still the right plan when the corpus fits a scan;
  *  - IVF (inverted-file) ANN: vectors are pre-assigned to their nearest
  *    centroid cell; a query probes only its cell, turning a corpus scan
  *    into a cell scan. Centroids here are 8 fixed stored vectors (no RNG —
  *    deterministic for the oracle); at scale they'd come from k-means and
  *    the cell id would be a partition/bucket column.
  */
object Similarity {

  /** (qid, vec_id, score) cosine scores of all query×candidate pairs,
    * queries broadcast. */
  private def scored(s: SparkSession, d: String, nQueries: Int): DataFrame = {
    val e = Tables.embeddings(s, d)
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), V.cosine(col("embedding"), col("qv")).as("score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact k-NN for 5 stored queries in one pass (rank window per query).
    "q36_knn_bruteforce" -> ((s, d) => {
      val w = Window.partitionBy(col("qid")).orderBy(desc("score"), col("vec_id"))
      scored(s, d, 5)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("score"))
        .orderBy(col("qid"), col("rank"))
    }),

    // IVF ANN: assign every vector to its nearest of 8 stored centroids,
    // then answer query vec 42 by scanning only its cell. Exactly one
    // block of the corpus is read — the scale path.
    "q37_ivf_ann" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val aw = Window.partitionBy(col("vec_id")).orderBy(desc("csim"), col("cid"))
      val assigned = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cid"),
          V.cosine(col("embedding"), col("cv")).as("csim"))
        .withColumn("arn", row_number().over(aw))
        .filter(col("arn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid"))
      val qCell = assigned.filter(col("vec_id") === 42)
        .select(col("cid").as("qcid"), col("embedding").as("qv"))
      assigned.join(broadcast(qCell), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= 42)
        .select(col("vec_id"), col("cid"), V.cosine(col("embedding"), col("qv")).as("score"))
        .orderBy(desc("score"), col("vec_id"))
        .limit(5)
    }))

  /** MLlib interop: BucketedRandomProjectionLSH over the embedding column
    * (fixed seed → deterministic buckets). Returns the approx top-k
    * neighbors of `queryVec` by euclidean distance — the library-provided
    * alternative to the hand-rolled IVF in q37; exposed for API
    * completeness and unit-tested (approx results are engine-specific, so
    * no DuckDB oracle). */
  def annLsh(s: SparkSession, d: String, queryVec: Long, k: Int): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.linalg.Vectors
    import org.apache.spark.sql.Row
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val df = Tables.embeddings(s, d)
      .select(col("vec_id"), toVec(col("embedding")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(2.0).setNumHashTables(4).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(df)
    val Row(qv: org.apache.spark.ml.linalg.Vector) =
      df.filter(col("vec_id") === queryVec).select(col("features")).head
    model.approxNearestNeighbors(df.filter(col("vec_id") =!= queryVec), qv, k)
      .select(col("vec_id"), col("distCol").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  def oracle: Map[String, String] = Map(
    "q36_knn_bruteforce" ->
      s"""SELECT qid, rank, vec_id, score FROM (
            SELECT qid, vec_id, score,
              row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
            FROM (SELECT q.vec_id AS qid, e.vec_id AS vec_id,
                    ${V.sqlCosine("e.embedding", "q.embedding")} AS score
                  FROM embeddings e, embeddings q
                  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id))
          WHERE rank <= 5 ORDER BY qid, rank""",

    "q37_ivf_ann" ->
      s"""WITH assigned AS (
            SELECT vec_id, embedding, cid FROM (
              SELECT e.vec_id, e.embedding, c.vec_id AS cid,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY ${V.sqlCosine("e.embedding", "c.embedding")} DESC, c.vec_id) AS arn
              FROM embeddings e, embeddings c WHERE c.vec_id < 8)
            WHERE arn = 1),
          q AS (SELECT cid AS qcid, embedding AS qv FROM assigned WHERE vec_id = 42)
          SELECT vec_id, cid, ${V.sqlCosine("embedding", "qv")} AS score
          FROM assigned, q WHERE cid = qcid AND vec_id <> 42
          ORDER BY score DESC, vec_id LIMIT 5""")
}
