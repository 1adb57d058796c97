package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffled, co-located storage so equi-joins and
  * aggregations on the bucket key plan with NO exchange — the "reuse a
  * partitioning across stages" lever. At 100 TB, bucketing the fact tables
  * on their join key turns every fact⋈fact join from a full shuffle of
  * both sides into a zip of pre-sorted buckets.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with matching bucket counts;
    * Catalyst reads the bucket spec and elides both shuffle exchanges. */
  def cooperativeJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
