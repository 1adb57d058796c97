package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{LakehouseTable => LT}

/** Micro-bench for the single-scan CDF range read (PLANS.md): a
  * 100-commit churn history read back as one `table_changes(2, 101)`
  * range. Run with `sbt "Test/runMain graft.CdfWideBench"`. */
object CdfWideBench {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("cdfwide")
      .toString + "/t"
    LT.create(Seq((1L, 0L)).toDF("id", "x").coalesce(1), root)
    LT.enableChangeDataFeed(s, root, Seq("id"))
    LT.exportDeltaLog(s, root)
    (1L to 100L).foreach(i =>
      LT.merge(s, root, Seq((1L, i)).toDF("id", "x"), Seq("id")))
    LT.readDeltaExportChanges(s, root, 2L, 101L).count() // warm
    val t0 = System.nanoTime
    val n = LT.readDeltaExportChanges(s, root, 2L, 101L).count()
    val ms = (System.nanoTime - t0) / 1e6
    val planStr = LT.readDeltaExportChanges(s, root, 2L, 101L)
      .queryExecution.executedPlan.toString
    println(f"CDF_WIDE rows=$n t=$ms%.0f ms")
    println("SCAN_LEGS=" + (planStr.split("FileScan parquet").length - 1))
    s.stop()
  }
}
