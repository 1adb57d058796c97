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
