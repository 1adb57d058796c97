package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Observer hooks (reference op #25, SURVEY.md §2.1: the
  * `on_retriever_end`/`on_llm_end` callback side-taps at app/app.py:102-130)
  * — engine-native as a QueryExecutionListener: every action's name,
  * wall-clock, and physical-plan fingerprint is captured out-of-band,
  * without touching the query plans themselves.
  */
object Observability {

  final case class ActionRecord(funcName: String, durationNs: Long,
      numOutputRows: Option[Long], planSummary: String)

  final class MetricsListener extends QueryExecutionListener {
    private val records = new ConcurrentLinkedQueue[ActionRecord]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val rows = Option(qe.executedPlan.metrics.get("numOutputRows"))
        .flatten.map(_.value)
      val head = qe.executedPlan.toString.linesIterator
        .take(1).mkString.trim.take(120)
      records.add(ActionRecord(funcName, durationNs, rows, head))
    }

    override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
      records.add(ActionRecord(s"$funcName[FAILED:${error.getClass.getSimpleName}]",
        -1L, None, ""))

    def snapshot(): Seq[ActionRecord] = records.iterator().asScala.toSeq
    def clear(): Unit = records.clear()
  }

  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: MetricsListener): Unit =
    spark.listenerManager.unregister(l)
}
