package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's named queries and their DuckDB oracle
  * twins. Each module keeps its `queries`/`oracle` maps side by side so the
  * column-name/ordering contract (Verify hash compare) is reviewed in one
  * place per operator.
  */
object SparkEntry {
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracle),
      (Rag.queries, Rag.oracle),
      (TextAnalysis.queries, TextAnalysis.oracle),
      (Dedup.queries, Dedup.oracle),
      (Similarity.queries, Similarity.oracle),
      (EventsOps.queries, EventsOps.oracle),
      (Multimodal.queries, Multimodal.oracle),
      (Pipelines.queries, Pipelines.oracle),
      (Ingest.queries, Ingest.oracle),
      (Lakehouse.queries, Lakehouse.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's entry-point-1 chain (SURVEY.md §3), engine-native. */
  def entry(spark: SparkSession): DataFrame =
    Rag.queries("q21_rag_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
