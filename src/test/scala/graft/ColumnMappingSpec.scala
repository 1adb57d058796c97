package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakehouseTable

/** Delta-style column mapping (ALTER TABLE RENAME/DROP COLUMN): stable
  * physical names in every data file, logical names at the read surface,
  * epoch-scoped via the manifest like every other schema change. */
class ColumnMappingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-colmap-$tag").resolve("t").toString

  private def seed(root: String): Unit =
    LakehouseTable.create(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "name", "score"), root)

  test("rename is metadata-only and appends lower the logical name to the stable physical one") {
    val root = freshRoot("rename")
    seed(root)
    val filesBefore = LakehouseTable.read(spark, root).inputFiles.toSet
    LakehouseTable.alterRenameColumn(spark, root, "score", "quality")
    // metadata-only: same files, new version
    assert(LakehouseTable.read(spark, root).inputFiles.toSet == filesBefore)
    assert(LakehouseTable.read(spark, root).columns.toSeq ==
      Seq("id", "name", "quality"))
    // append THROUGH the logical schema
    LakehouseTable.append(Seq((4L, "d", 40.0)).toDF("id", "name", "quality"), root)
    val t = LakehouseTable.read(spark, root)
    assert(t.columns.toSeq == Seq("id", "name", "quality"))
    assert(t.agg(sum("quality")).head().getDouble(0) == 100.0)
    // every data file (old AND new) carries the PHYSICAL column name: the
    // raw footer union must show `score` and never `quality`
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(Paths.get(root, "data").toString)
    assert(raw.columns.contains("score") && !raw.columns.contains("quality"))
    // time travel sees the pre-rename name
    assert(LakehouseTable.read(spark, root, Some(0L)).columns.contains("score"))
  }

  test("COW update and merge keep working through the mapping") {
    val root = freshRoot("cow")
    seed(root)
    LakehouseTable.alterRenameColumn(spark, root, "score", "quality")
    LakehouseTable.updateWhere(spark, root,
      Seq("quality" -> "quality * 2"), "id = 2")
    assert(LakehouseTable.read(spark, root)
      .filter($"id" === 2).head().getAs[Double]("quality") == 40.0)
    LakehouseTable.merge(spark, root,
      Seq((3L, "c2", 99.0), (5L, "e", 50.0)).toDF("id", "name", "quality"),
      Seq("id"))
    val t = LakehouseTable.read(spark, root).orderBy("id")
    assert(t.count() == 4)
    assert(t.filter($"id" === 3).head().getAs[String]("name") == "c2")
    // rewritten files still carry the physical name only
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(Paths.get(root, "data").toString)
    assert(raw.columns.contains("score") && !raw.columns.contains("quality"))
  }

  test("drop hides the column, tombstones its physical name, and RESTORE resurrects the epoch") {
    val root = freshRoot("drop")
    seed(root)
    LakehouseTable.alterDropColumns(spark, root, Seq("name"))
    assert(LakehouseTable.read(spark, root).columns.toSeq == Seq("id", "score"))
    // time travel still sees it
    assert(LakehouseTable.read(spark, root, Some(0L)).columns.contains("name"))
    // the physical name is a tombstone: appends and ALTER ADD both refuse
    val ex1 = intercept[IllegalArgumentException] {
      LakehouseTable.append(
        Seq((9L, "x", 1.0)).toDF("id", "name", "score"), root)
    }
    assert(ex1.getMessage.contains("dropped"))
    val ex2 = intercept[IllegalArgumentException] {
      LakehouseTable.alterAddColumns(root, "name STRING")
    }
    assert(ex2.getMessage.contains("dropped"))
    // RESTORE to the pre-drop epoch clears the mapping entirely
    LakehouseTable.restore(root, 0L)
    val t = LakehouseTable.read(spark, root)
    assert(t.columns.toSeq == Seq("id", "name", "score"))
    assert(t.count() == 3)
    // and the tombstone is gone with it
    LakehouseTable.append(Seq((9L, "x", 1.0)).toDF("id", "name", "score"), root)
    assert(LakehouseTable.read(spark, root).count() == 4)
  }

  test("dropping an ALTER-ADDed column that no file carries leaves no tombstone") {
    val root = freshRoot("addrop")
    seed(root)
    LakehouseTable.alterAddColumns(root, "extra BIGINT")
    LakehouseTable.alterDropColumns(spark, root, Seq("extra"))
    // the name was never physical anywhere — re-adding it must be legal
    LakehouseTable.alterAddColumns(root, "extra BIGINT")
    assert(LakehouseTable.read(spark, root).columns.contains("extra"))
  }

  test("rename guards: partition columns, collisions, ambiguous writes") {
    val root = freshRoot("guards")
    LakehouseTable.create(
      Seq((1L, "x", 1.0)).toDF("id", "part", "v"), root,
      partitionBy = Seq("part"))
    intercept[IllegalArgumentException] {
      LakehouseTable.alterRenameColumn(spark, root, "part", "p2")
    }
    intercept[IllegalArgumentException] {
      LakehouseTable.alterRenameColumn(spark, root, "v", "id")
    }
    intercept[IllegalArgumentException] {
      LakehouseTable.alterRenameColumn(spark, root, "missing", "m")
    }
    LakehouseTable.alterRenameColumn(spark, root, "v", "w")
    // a frame carrying BOTH the physical and logical name is ambiguous
    val ex = intercept[IllegalArgumentException] {
      LakehouseTable.append(
        Seq((2L, "x", 1.0, 2.0)).toDF("id", "part", "v", "w"), root,
        partitionBy = Seq("part"))
    }
    assert(ex.getMessage.contains("ambiguous"))
    // rename back to the original physical name clears the mapping entry
    LakehouseTable.alterRenameColumn(spark, root, "w", "v")
    assert(LakehouseTable.renamedColumnsAt(root,
      LakehouseTable.currentVersion(root).get).isEmpty)
  }

  test("delta export carries column mapping (name mode) and the log-only read honors it") {
    val root = freshRoot("export")
    seed(root)
    LakehouseTable.alterRenameColumn(spark, root, "score", "quality")
    LakehouseTable.append(Seq((4L, "d", 40.0)).toDF("id", "name", "quality"), root)
    LakehouseTable.exportDeltaLog(spark, root)
    val logDir = Paths.get(root, "_delta_log")
    val logText = Files.list(logDir).toArray.map(p =>
      Files.readString(p.asInstanceOf[java.nio.file.Path])).mkString("\n")
    // protocol upgraded to column mapping's floor at the rename version
    assert(logText.contains(""""minReaderVersion":2"""))
    assert(logText.contains("delta.columnMapping.physicalName"))
    assert(logText.contains(""""delta.columnMapping.mode":"name""""))
    // the log-only reader (what a foreign engine does) surfaces logical
    // names with pre-rename files' values intact
    val viaLog = LakehouseTable.readDeltaExport(spark, root)
    assert(viaLog.columns.toSeq == Seq("id", "name", "quality"))
    assert(viaLog.agg(sum("quality")).head().getDouble(0) == 100.0)
  }

  test("materializeMapping physicalizes logical names and clears every tombstone") {
    val root = freshRoot("mat")
    seed(root)
    LakehouseTable.alterRenameColumn(spark, root, "score", "quality")
    LakehouseTable.alterDropColumns(spark, root, Seq("name"))
    LakehouseTable.materializeMapping(spark, root, numFiles = 1)
    val cur = LakehouseTable.currentVersion(root).get
    assert(LakehouseTable.renamedColumnsAt(root, cur).isEmpty)
    assert(LakehouseTable.droppedColumnsAt(root, cur).isEmpty)
    val t = LakehouseTable.read(spark, root)
    assert(t.columns.toSeq == Seq("id", "quality") && t.count() == 3)
    // the REWRITTEN files physically carry the logical name now
    val newFiles = t.inputFiles
    assert(spark.read.parquet(scala.collection.immutable.ArraySeq.unsafeWrapArray(newFiles): _*).columns.contains("quality"))
    // dropped and renamed-away names are usable again
    LakehouseTable.alterAddColumns(root, "name STRING")
    LakehouseTable.append(
      Seq((4L, 40.0, "d")).toDF("id", "quality", "name"), root)
    assert(LakehouseTable.read(spark, root).count() == 4)
    // pre-materialization epochs still read with their own names
    assert(LakehouseTable.read(spark, root, Some(0L)).columns.toSeq ==
      Seq("id", "name", "score"))
  }

  test("SQL face: RENAME/DROP COLUMN statements parse, run, and refresh the view") {
    val root = freshRoot("sql")
    seed(root)
    graft.sql.GraftSql.register(spark, "colmap_sql_t", root)
    graft.sql.GraftSql.sql(spark,
      "ALTER TABLE colmap_sql_t RENAME COLUMN score TO quality")
    graft.sql.GraftSql.sql(spark, "ALTER TABLE colmap_sql_t DROP COLUMN name")
    val got = graft.sql.GraftSql.sql(spark,
      "SELECT id, quality FROM colmap_sql_t ORDER BY id")
    assert(got.columns.toSeq == Seq("id", "quality"))
    assert(got.collect().map(_.getDouble(1)).toSeq == Seq(10.0, 20.0, 30.0))
    // time travel through the SQL face sees the original schema
    val v0 = graft.sql.GraftSql.sql(spark,
      "SELECT * FROM colmap_sql_t VERSION AS OF 0")
    assert(v0.columns.toSeq == Seq("id", "name", "score"))
    // DESCRIBE COLUMNS exposes the logical→physical mapping
    val desc = graft.sql.GraftSql.sql(spark, "DESCRIBE COLUMNS colmap_sql_t")
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(desc == Seq("id" -> "id", "quality" -> "score"))
    graft.sql.GraftSql.sql(spark, "DROP TABLE colmap_sql_t")
  }
}
