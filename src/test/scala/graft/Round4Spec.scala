package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakehouseTable

/** Targeted properties of the round-4 additions: the restore+vacuum
  * lifecycle physically removes dead files, and the incremental read is
  * exactly the appended slice. */
class Round4Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q114: vacuum leaves exactly the restored manifest's files on disk") {
    val root = operators.Lakehouse.ordersRestoreRoot(spark, sf)
    // after the builder: only the restore version survives vacuum
    assert(LakehouseTable.versions(root) == Seq(3L),
      s"expected only v3 after vacuum, got ${LakehouseTable.versions(root)}")
    // the on-disk data file set must equal v3's manifest EXACTLY: a
    // file referenced-but-deleted breaks reads (caught by the gate); a
    // file present-but-unreferenced means vacuum left dead merge/delete
    // rewrites behind (the thing this test exists to catch)
    val live = LakehouseTable.read(spark, root).inputFiles
      .map(f => Paths.get(f.stripPrefix("file:")).getFileName.toString).toSet
    val onDisk = {
      val s = Files.walk(Paths.get(root, "data"))
      try s.iterator().asScala.filter(p => Files.isRegularFile(p))
        .map(_.getFileName.toString).toSet
      finally s.close()
    }
    assert(onDisk == live,
      s"dead files survived vacuum: ${onDisk.diff(live)}; missing: ${live.diff(onDisk)}")
    // and the restored content is the original projection (pre-merge)
    val orig = graft.sources.Tables.orders(spark, sf).count()
    assert(LakehouseTable.read(spark, root).count() == orig)
  }

  test("q116: change feed classifies net changes and ignores pure file churn") {
    val root = operators.Lakehouse.ordersMergeRoot(spark, sf)
    val feed = LakehouseTable.changeFeed(spark, root, 0L, 2L, Seq("o_orderkey"))
    val byType = feed.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = graft.sources.Tables.orders(spark, sf)
    // inserts: -key twins whose (unchanged) price survives the delete
    val ins = orders.filter(col("o_orderkey") % 997 === 0 &&
      col("o_orderkey") =!= 0 && col("o_totalprice") >= 10000.0).count()
    assert(byType.getOrElse("insert", 0L) == ins)
    // updates emit pre+post pairs, one each per surviving %97 key
    assert(byType.getOrElse("update_preimage", 0L) ==
      byType.getOrElse("update_postimage", 0L))
    val upd = orders.filter(col("o_orderkey") % 97 === 0 &&
      col("o_totalprice") * 1.25 >= 10000.0 &&
      col("o_totalprice") * 1.25 =!= col("o_totalprice")).count()
    assert(byType.getOrElse("update_preimage", 0L) == upd)
    // deletes: rows below the threshold at v2 (including %97 rows whose
    // UPDATED price fell below it — net classification, not per-step)
    val del = orders.filter(
      when(col("o_orderkey") % 97 === 0, col("o_totalprice") * 1.25 < 10000.0)
        .otherwise(col("o_totalprice") < 10000.0)).count()
    assert(byType.getOrElse("delete", 0L) == del)
    // pure file churn emits nothing: compacting a copy produces an empty feed
    val tmp = Files.createTempDirectory("cdc_churn").toString
    LakehouseTable.create(orders.select("o_orderkey", "o_totalprice").limit(100), tmp)
    LakehouseTable.compact(spark, tmp, numFiles = 1)
    assert(LakehouseTable.changeFeed(spark, tmp, 0L, 1L, Seq("o_orderkey")).count() == 0)
  }

  test("ExactPercentile is bit-identical to Spark's percentile aggregate") {
    import spark.implicits._
    // deterministic data with heavy duplicates, negatives, integral and
    // fractional interpolation positions, and a 1-element group
    val rng = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      val g = s"g${i % 7}"
      val v = if (i % 3 == 0) (i % 11).toDouble else rng.nextGaussian() * 100
      (g, v)
    } :+ ("solo", 3.14)
    val df = rows.toDF("g", "v")
    val ps = Seq("p00" -> 0.0, "p05" -> 0.05, "p25" -> 0.25, "p50" -> 0.5,
      "p90" -> 0.9, "p100" -> 1.0)
    val ours = operators.ExactPercentile.percentiles(df, Seq("g"), col("v"), ps)
      .orderBy("g").collect()
    val ref = df.groupBy("g")
      .agg(ps.map { case (n, p) => percentile(col("v"), lit(p)).as(n) }.head,
        ps.tail.map { case (n, p) => percentile(col("v"), lit(p)).as(n) }: _*)
      .orderBy("g").collect()
    assert(ours.length == ref.length)
    ours.zip(ref).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      ps.indices.foreach { i =>
        val (x, y) = (a.getDouble(i + 1), b.getDouble(i + 1))
        assert(java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y),
          s"group ${a.getString(0)} ${ps(i)._1}: $x != $y")
      }
    }
  }

  test("SRP band width grows with the corpus and stays unsaturated at sf0.1") {
    import operators.Dedup
    // steps at the exact integer bounds of n/2^w < cap/2
    assert(Dedup.adaptiveSrpWidth(500) == 4)
    assert(Dedup.adaptiveSrpWidth(7999) == 4)
    assert(Dedup.adaptiveSrpWidth(8000) == 8)
    assert(Dedup.adaptiveSrpWidth(127999) == 8)
    assert(Dedup.adaptiveSrpWidth(128000) == 16)
    // monotone non-decreasing in n
    val widths = Seq(1L, 100L, 10000L, 100000L, 1000000L).map(Dedup.adaptiveSrpWidth)
    assert(widths == widths.sorted)
    // the width chosen for the BENCH corpus keeps buckets under half the
    // stop-key cap, so the saturation warning stays silent at sf0.1
    val n = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1").count()
    val w = Dedup.adaptiveSrpWidth(n)
    assert(n.toDouble / (1L << w) < Dedup.StopShingleCap * 0.5,
      s"width $w saturates at n=$n")
  }

  test("syncAggregateCdc applies signed change-feed deltas across rewrites") {
    import graft.sources.IncrementalView
    import spark.implicits._
    val base = Files.createTempDirectory("cdcview").toString
    val srcRoot = s"$base/src"; val aggRoot = s"$base/agg"
    LakehouseTable.create(
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0),
        (5L, "c", 5.0)).toDF("id", "g", "v"), srcRoot)
    assert(IncrementalView.syncAggregateCdc(
      spark, srcRoot, aggRoot, Seq("id"), "g", "v")._2 ==
      IncrementalView.SyncMode.Created)
    // rewrite: double id=1's value AND migrate id=3 from group b to a
    LakehouseTable.merge(spark, srcRoot,
      Seq((1L, "a", 2.0), (3L, "a", 3.0)).toDF("id", "g", "v"), Seq("id"))
    // erase group c entirely — its n must reach 0 and the row must go
    LakehouseTable.deleteWhere(spark, srcRoot, "g = 'c'")
    val (_, mode) = IncrementalView.syncAggregateCdc(
      spark, srcRoot, aggRoot, Seq("id"), "g", "v")
    assert(mode == IncrementalView.SyncMode.CdcDelta)
    val got = LakehouseTable.read(spark, aggRoot).orderBy("g")
      .select("g", "n", "sum_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue))
    assert(got.toSeq == Seq(("a", 3L, 7.0), ("b", 1L, 4.0)))
    // idempotent rerun
    assert(IncrementalView.syncAggregateCdc(
      spark, srcRoot, aggRoot, Seq("id"), "g", "v")._2 ==
      IncrementalView.SyncMode.NoOp)
  }

  test("q119: bloom sidecar skips files range stats cannot") {
    val root = operators.Lakehouse.lineitemBloomRoot(spark, sf)
    val full = LakehouseTable.read(spark, root)
    val total = full.inputFiles.length
    assert(total >= 4, s"expected a multi-file table, got $total")
    // hash-distributed layout: every file spans ~the full key range, so a
    // range prune keeps everything...
    val byRange = LakehouseTable.readPruned(spark, root, "l_orderkey", 1234, 1234)
    assert(byRange.inputFiles.length == total, "range stats should not prune here")
    // ...but the bloom prunes to the file(s) actually holding the key
    val byBloom = LakehouseTable.readBloomPruned(spark, root, "l_orderkey", 1234L)
    assert(byBloom.inputFiles.length * 2 <= total,
      s"weak bloom pruning: ${byBloom.inputFiles.length} of $total files")
    val expected = full.filter(col("l_orderkey") === 1234L).count()
    assert(byBloom.filter(col("l_orderkey") === 1234L).count() == expected
      && expected > 0)
  }

  test("mergeApply + TableSync replicate a table through its change feed") {
    import graft.sources.TableSync
    import spark.implicits._
    val base = Files.createTempDirectory("tablesync").toString
    val srcRoot = s"$base/src"; val dstRoot = s"$base/dst"
    LakehouseTable.create(
      (1L to 20L).map(i => (i, s"v$i")).toDF("id", "s"), srcRoot)
    TableSync.seed(spark, srcRoot, dstRoot) // in-sync at v0
    // three source transitions: append, merge (update + insert), delete
    LakehouseTable.append((21L to 25L).map(i => (i, s"v$i")).toDF("id", "s"), srcRoot)
    LakehouseTable.merge(spark, srcRoot,
      Seq((1L, "updated"), (100L, "inserted")).toDF("id", "s"), Seq("id"))
    LakehouseTable.deleteWhere(spark, srcRoot, "id BETWEEN 10 AND 15")
    val (v, mode) = TableSync.applyChanges(spark, srcRoot, dstRoot, Seq("id"))
    assert(mode == TableSync.Mode.Applied && v == 3L)
    // follower == source, row for row
    val srcRows = LakehouseTable.read(spark, srcRoot)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val dstRows = LakehouseTable.read(spark, dstRoot)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(dstRows.sameElements(srcRows) && srcRows.length == 20)
    assert(srcRows.contains((1L, "updated")) && srcRows.contains((100L, "inserted")))
    // idempotent rerun
    assert(TableSync.applyChanges(spark, srcRoot, dstRoot, Seq("id"))._2 ==
      TableSync.Mode.NoOp)
    // mergeApply: a key in BOTH sets ends up with the update row
    LakehouseTable.mergeApply(spark, dstRoot,
      updates = Seq((2L, "both")).toDF("id", "s"),
      deleteKeys = Seq((2L, ""), (3L, "")).toDF("id", "s"),
      keys = Seq("id"))
    val after = LakehouseTable.read(spark, dstRoot).filter(col("id").isin(2L, 3L))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(after.toSeq == Seq((2L, "both")))
  }

  test("updateWhere and deleteWhere rewrite only files containing matches") {
    import spark.implicits._
    val root = Files.createTempDirectory("cow_prune").toString + "/t"
    // 4 files, keys co-located: predicate on one key touches ONE file
    LakehouseTable.create(
      (0L until 400L).map(i => (i, i % 4, 1.0)).toDF("id", "grp", "v")
        .repartitionByRange(4, col("grp")), root)
    val v0Files = LakehouseTable.read(spark, root).inputFiles.toSet
    assert(v0Files.size == 4)
    LakehouseTable.updateWhere(spark, root, Seq("v" -> "v * 2.0"), "grp = 1")
    val v1Files = LakehouseTable.read(spark, root).inputFiles.toSet
    assert((v0Files intersect v1Files).size == 3, "update rewrote untouched files")
    val t1 = LakehouseTable.read(spark, root)
    assert(t1.filter(col("grp") === 1 && col("v") =!= 2.0).count() == 0)
    assert(t1.filter(col("grp") =!= 1 && col("v") =!= 1.0).count() == 0)
    LakehouseTable.deleteWhere(spark, root, "grp = 2")
    val v2Files = LakehouseTable.read(spark, root).inputFiles.toSet
    assert((v1Files intersect v2Files).size == 3, "delete rewrote untouched files")
    assert(LakehouseTable.read(spark, root).count() == 300)
    // no-match predicates are version-less no-ops
    val cur = LakehouseTable.currentVersion(root)
    LakehouseTable.deleteWhere(spark, root, "grp = 99")
    LakehouseTable.updateWhere(spark, root, Seq("v" -> "0.0"), "grp = 99")
    assert(LakehouseTable.currentVersion(root) == cur)
    // SET expressions see the PRE-update row (swap is not sequential)
    LakehouseTable.updateWhere(spark, root,
      Seq("id" -> "grp", "grp" -> "id"), "grp = 3")
    val swapped = LakehouseTable.read(spark, root).filter(col("id") === 3)
    // sequential SET evaluation would assign grp the NEW id (3) everywhere;
    // pre-update semantics keep the original ids, whose max is 399
    assert(swapped.count() == 100 &&
      swapped.agg(max(col("grp"))).head().getLong(0) == 399L)
  }

  test("q115: incremental read returns the appended slice, nothing else") {
    val root = operators.Lakehouse.eventsEvolvedRoot(spark, sf)
    val inc = LakehouseTable.readIncremental(spark, root, 0L, Some(1L))
    val ev = graft.sources.Tables.events(spark, sf)
    assert(inc.count() == ev.filter(col("event_id") % 2 === 1).count())
    // every incremental row is odd-id (v0's even ids never reappear)
    assert(inc.filter(col("event_id") % 2 === 0).count() == 0)
    // same-version diff is empty, not an error
    assert(LakehouseTable.readIncremental(spark, root, 1L, Some(1L)).count() == 0)
  }
}
