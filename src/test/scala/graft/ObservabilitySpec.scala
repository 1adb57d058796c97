package graft

import org.scalatest.funsuite.AnyFunSuite

class ObservabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("listener taps actions out-of-band with durations") {
    val l = Observability.attach(spark)
    try {
      SparkEntry.queries("q21_rag_topk")(spark, "/root/testdata/sf0.001").collect()
      // listener delivery is async — poll
      val deadline = System.nanoTime() + 30_000_000_000L
      while (l.snapshot().isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val recs = l.snapshot()
      assert(recs.nonEmpty, "no action records captured")
      assert(recs.exists(r => r.funcName == "collect" && r.durationNs > 0))
    } finally Observability.detach(spark, l)
  }

  test("failure hook records the failed action instead of throwing") {
    val l = Observability.attach(spark)
    try {
      intercept[Exception] {
        spark.read.parquet("/nonexistent/path").collect()
      }
      Thread.sleep(500)
      // failure during analysis may or may not reach the listener depending
      // on the phase; the listener itself must never throw
      assert(l.snapshot() != null)
    } finally Observability.detach(spark, l)
  }
}
