package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{IcebergMeta, LakehouseTable => LT}

/** Micro-bench for the single-scan Iceberg changelog (PLANS.md): a
  * 100-commit churn history (appends + periodic COW merges) derived
  * back as one `icebergChangelog(1, 101)` range. Run with
  * `sbt "Test/runMain graft.IcebergChangelogWideBench"`. */
object IcebergChangelogWideBench {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("icewide")
      .toString + "/t"
    LT.create(Seq((1L, 0L)).toDF("id", "x").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(s, root) // write-through from here on
    (1 to 100).foreach { i =>
      if (i % 10 == 0)
        LT.merge(s, root, Seq((1L, i.toLong)).toDF("id", "x"), Seq("id"))
      else
        LT.append(Seq(((100 + i).toLong, i.toLong)).toDF("id", "x")
          .coalesce(1), root)
    }
    def read() = IcebergMeta.icebergChangelog(s, root, 1L, 102L, Seq("id"))
    read().count() // warm
    val t0 = System.nanoTime
    val n = read().count()
    val ms = (System.nanoTime - t0) / 1e6
    val planStr = read().queryExecution.executedPlan.toString
    println(f"ICEBERG_CHANGELOG_WIDE rows=$n t=$ms%.0f ms")
    println("SCAN_LEGS=" + (planStr.split("FileScan parquet").length - 1))
    s.stop()
  }
}
