package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch profiling main (like [[Profile]]): per-query breakdown of where
  * bench wall time goes — plan-construction time vs action time, job/stage
  * counts, summed executor task time. Drives the optimization round's
  * "measure first" loop; not part of the engine surface.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.QueryProfile [sfDir] [q ...]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          taskTimeMs.addAndGet(t.taskMetrics.executorRunTime)
    })

    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // warmup pass (JIT, codegen cache, relation caches — bench does the same)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    println(f"${"query"}%-34s ${"cons_s"}%7s ${"act_s"}%7s ${"jobs"}%5s ${"stgs"}%5s ${"tasks"}%6s ${"exec_s"}%7s")
    names.foreach { n =>
      // settle listener events from the previous query
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      try df.count() catch { case _: Throwable => () }
      val t2 = System.nanoTime()
      Thread.sleep(300)
      println(f"$n%-34s ${(t1 - t0) / 1e9}%7.3f ${(t2 - t1) / 1e9}%7.3f ${jobs.get}%5d ${stages.get}%5d ${tasks.get}%6d ${taskTimeMs.get / 1e3}%7.2f")
    }
    spark.stop()
  }
}
