package org.apache.spark.sql

/** One-method bridge into `private[sql]` territory: a DSv1 streaming
  * `Source.getBatch` must return a DataFrame whose logical plan carries
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * constructor for that — `internalCreateDataFrame` — is `private[sql]`.
  * Spark's own file stream source uses exactly this call
  * (`FileStreamSource.getBatch` →
  * `sparkSession.internalCreateDataFrame(rdd, schema, isStreaming =
  * true)`); this shim re-exposes it to graft's table source and nothing
  * else. Kept to the minimum surface: one pure function, no state
  * (public visibility: the caller lives in package graft.streaming). */
object GraftStreamingShims {
  /** `df`'s rows as a streaming-tagged DataFrame with the same schema. */
  def streamingDataFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cs.internalCreateDataFrame(cdf.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** The inverse direction, for a DSv1 streaming SINK: the DataFrame
    * handed to `Sink.addBatch` still references the micro-batch plan;
    * re-planning it through an ordinary write can re-trigger or trip the
    * streaming-source assertion. Rebasing the already-planned RDD into a
    * fresh batch DataFrame (what Delta's DSv1 sink does) makes it safe
    * to hand to any batch writer exactly once. */
  def batchDataFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cs.internalCreateDataFrame(cdf.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }

  /** Dataset over an already-built logical plan (`Dataset.ofRows` is
    * `private[sql]`): how ANALYZE-computed `CatalogStatistics` get
    * re-attached to a read's `LogicalRelation` for the CBO. */
  def dataFrameFromPlan(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
