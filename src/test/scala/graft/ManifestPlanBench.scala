package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{IcebergMeta, LakehouseTable => LT}

/** Micro-bench for manifest-list partition-summary pruning at the
  * manifest counts where it matters (PLANS.md): a 500-commit
  * streaming-append chain (one tiny manifest per commit, 50 partition
  * values round-robin) planned for one partition, with summaries vs
  * the same chain summary-stripped. Measures the DRIVER planning walk
  * (`plannedDataManifests` + the per-file metrics index restricted to
  * survivors) — the piece that is O(all manifests) without summaries.
  * Run with `sbt "Test/runMain graft.ManifestPlanBench [N]"`. */
object ManifestPlanBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("mfplan")
      .toString + "/t"
    val t0 = System.nanoTime
    LT.create((0 until 50).map(i => (i.toLong, i % 50))
      .toDF("k", "part").coalesce(1), root, partitionBy = Seq("part"))
    IcebergMeta.exportIcebergMeta(s, root)
    (1 to n).foreach { i =>
      IcebergMeta.appendIcebergForeign(s, root,
        Seq((1000L + i, i % 50)).toDF("k", "part").coalesce(1))
      ()
    }
    println(f"BUILD n=$n t=${(System.nanoTime - t0) / 1e9}%.1f s")
    // GRAFT_DROP_CACHES=1 (needs root): evict the page cache before
    // each timed walk so the number reflects real per-manifest IO —
    // the object-store round-trip shape — instead of warm-cache decode
    val cold = sys.env.get("GRAFT_DROP_CACHES").contains("1")
    def planMs(what: String): (Int, Double) = {
      // ALWAYS warm first — classloading/JIT of the planning path must
      // not be billed to the first timed walk
      IcebergMeta.plannedDataManifests(s, root, Some("part = 7"))
      if (cold)
        scala.util.Try(new ProcessBuilder("sh", "-c",
          "sync; echo 3 > /proc/sys/vm/drop_caches")
          .inheritIO().start().waitFor())
      val t = System.nanoTime
      val kept = IcebergMeta.plannedDataManifests(s, root,
        Some("part = 7"))
      val ms = (System.nanoTime - t) / 1e6
      println(f"$what cold=$cold opened=${kept.size} plan=$ms%.1f ms")
      (kept.size, ms)
    }
    val (keptA, _) = planMs("SUMMARIES")
    val rowsA = IcebergMeta.readIceberg(s, root,
      pruneWhere = Some("part = 7")).count()
    operators.Lakehouse.stripManifestListSummaries(root)
    val (keptB, _) = planMs("STRIPPED ")
    val rowsB = IcebergMeta.readIceberg(s, root,
      pruneWhere = Some("part = 7")).count()
    println(s"ROWS summaries=$rowsA stripped=$rowsB " +
      s"(must match) manifests=$keptB total, $keptA kept")
    s.stop()
  }
}
