package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Per-query EXECUTION metrics, harvested synchronously from an executed
  * plan's SQLMetrics — shuffle bytes written, file bytes read, files
  * read, and shuffle-exchange count. These are the numbers the scale
  * claims in SURVEY/PLANS rest on ("one exchange", "pruned to N files",
  * "no corpus re-scan"): harvesting makes them MEASURED per bench query
  * instead of asserted, with no Spark UI.
  *
  * AQE wraps the real plan in AdaptiveSparkPlanExec / QueryStageExec —
  * traversal follows the EXECUTED adaptive plan (final stages), not the
  * initial one, so the numbers reflect what actually ran. Jobs a query
  * runs while BUILDING its frame (iterative trainers' collects) are
  * outside the final action's plan and deliberately out of scope — the
  * serving-path cost is what the bench times. */
object MetricsHarvest {
  case class Totals(shuffleBytes: Long, scanBytes: Long, filesRead: Long,
      exchanges: Long) {
    def json: String =
      s"""{"shuffle_bytes":$shuffleBytes,"scan_bytes":$scanBytes,""" +
        s""""files_read":$filesRead,"exchanges":$exchanges}"""
  }

  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    kids.foreach(walk(_)(f))
    p.subqueries.foreach(walk(_)(f))
  }

  def of(plan: SparkPlan): Totals = {
    var sh = 0L; var sc = 0L; var nf = 0L; var ex = 0L
    try walk(plan) { node =>
      if (node.nodeName.contains("Exchange") &&
          !node.nodeName.contains("Broadcast")) ex += 1
      node.metrics.foreach { case (key, m) =>
        m.name.getOrElse(key) match {
          case "shuffle bytes written" => sh += m.value
          case "size of files read"    => sc += m.value
          case "number of files read"  => nf += m.value
          case _                       => ()
        }
      }
    } catch { case _: Throwable => () } // diagnostics only
    Totals(sh, sc, nf, ex)
  }
}
