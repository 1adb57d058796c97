package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamingShims, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Shared tail of the foreign-format streaming sources (delta-export /
  * iceberg-export): the mid-stream schema guard and the planned-schema
  * alignment. The engine requires every batch to match the schema it
  * planned at start — a column the CURRENT foreign schema no longer
  * carries (rename/drop) or whose type changed cannot be null-filled or
  * cast away silently; fail loudly and let a restart adopt the new
  * schema. (A column merely absent from one batch's FILES — a ragged
  * append — null-fills inside the slice read itself, which always
  * projects the full current schema.) One helper, so the two sources
  * cannot drift. */
private[streaming] object ForeignSourceAlign {
  def guardAndAlign(spark: SparkSession, sourceLabel: String, root: String,
      schema: StructType, batch: DataFrame): DataFrame = {
    schema.foreach { f =>
      batch.schema.find(_.name.equalsIgnoreCase(f.name)) match {
        case None =>
          throw new IllegalStateException(
            s"$sourceLabel stream over $root: column '${f.name}' left " +
              "the foreign schema mid-stream (rename/drop). Restart the " +
              "query to adopt the new schema.")
        case Some(a) if a.dataType != f.dataType =>
          throw new IllegalStateException(
            s"$sourceLabel stream over $root: column '${f.name}' " +
              s"changed type ${f.dataType.sql} -> ${a.dataType.sql} " +
              "mid-stream. Restart the query to adopt the new schema.")
        case _ => ()
      }
    }
    val aligned = batch.select(schema.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    GraftStreamingShims.streamingDataFrame(spark, aligned)
  }
}
