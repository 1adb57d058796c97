package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LakehouseTable => LT}

/** Round-9 pins: foreign-truncated Delta logs (no marker, chain starting
  * above 0) refuse unseeded replay; Iceberg export never bakes a failed
  * footer read into record_count. */
class Round9Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/r9_$name"
    val p = Paths.get(r)
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(p)
    r
  }

  test("foreign-truncated Delta log (no marker, head > 0) refuses unseeded replay") {
    import spark.implicits._
    val root = freshRoot("foreign_trunc")
    LT.create(Seq((0L, "a")).toDF("id", "v"), root)
    (1L until 12L).foreach(i =>
      LT.append(Seq((i, "x")).toDF("id", "v"), root))
    LT.exportDeltaLog(spark, root)
    LT.exportDeltaCheckpoint(spark, root, 10L)
    // simulate the OTHER engine's metadata cleanup: versions below the
    // checkpoint removed, and no graft truncation marker exists
    val logDir = Paths.get(root, "_delta_log")
    (0L until 10L).foreach(v =>
      Files.deleteIfExists(logDir.resolve(f"$v%020d.json")))
    assert(!Files.exists(logDir.resolve("_graft_truncation")))
    // checkpoint-seeded read still serves the table
    assert(LT.readDeltaExport(spark, root).orderBy("id").collect().toSeq ==
      LT.read(spark, root).orderBy("id").collect().toSeq)
    // worst case: the copy ALSO lost _last_checkpoint (rsync of JSONs
    // only) — no marker, no pointer, a gap-free chain starting at 10.
    // Both gap checks pass; only the starts-at-0 requirement refuses.
    Files.deleteIfExists(logDir.resolve("_last_checkpoint"))
    val ex = intercept[IllegalArgumentException] {
      LT.readDeltaExport(spark, root)
    }
    assert(ex.getMessage.contains("starts at version 10"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      LT.readDeltaExport(spark, root, useCheckpoint = false)
    }
    assert(ex2.getMessage.contains("truncated below its checkpoint"),
      ex2.getMessage)
  }

  test("CDF export: pure adds derive, churn writes cdc, compaction writes the empty marker") {
    import spark.implicits._
    val root = freshRoot("cdf")
    LT.create((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"), root)
    LT.enableChangeDataFeed(spark, root, Seq("id"))          // v1
    LT.exportDeltaLog(spark, root)
    // v2: plain append through the WRITE-THROUGH hook — a pure add must
    // stay cdc-free (the spec derives its inserts)
    LT.append(Seq((100L, "x"), (101L, "y")).toDF("id", "v"), root)
    val logDir = Paths.get(root, "_delta_log")
    def logTxt(v: Long): String =
      Files.readString(logDir.resolve(f"$v%020d.json"))
    assert(!logTxt(2L).contains("\"cdc\""),
      "pure add must not carry cdc actions")
    val derived = LT.readDeltaExportChanges(spark, root, 2L, 2L)
    assert(derived.filter(col("_change_type") === "insert").count() == 2)
    // v3: COW delete — non-derivable, must carry cdc with the removed rows
    LT.deleteWhere(spark, root, "id >= 100")
    assert(logTxt(3L).contains("\"cdc\""))
    val del = LT.readDeltaExportChanges(spark, root, 3L, 3L)
    assert(del.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("delete"))
    assert(del.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
      == Seq(100L, 101L))
    // v4: MOR delete — a DV change is never derivable, must carry cdc
    LT.deleteWhereMor(spark, root, "id = 3")
    assert(logTxt(4L).contains("\"cdc\""))
    val mor = LT.readDeltaExportChanges(spark, root, 4L, 4L)
    assert(mor.collect().map(r =>
      (r.getAs[String]("_change_type"), r.getAs[Long]("id"))).toSeq ==
      Seq(("delete", 3L)))
    // v5: compaction churn with no logical changes — the EMPTY cdc
    // marker must be present (a reader deriving from the rewrite's
    // add/remove actions would hallucinate inserts + deletes)
    LT.materializeDvs(spark, root)                            // v5 rewrite
    assert(logTxt(5L).contains("\"cdc\""),
      "churn-only commit needs the empty cdc marker")
    assert(LT.readDeltaExportChanges(spark, root, 5L, 5L).count() == 0)
    // the whole range replays: inserts(2) + deletes(3) + delete(1)
    val all = LT.readDeltaExportChanges(spark, root, 1L, 5L)
    assert(all.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("insert" -> 2L, "delete" -> 3L))
    // refusal on a CDF-less log
    val root2 = freshRoot("cdf_off")
    LT.create(Seq((1L, "a")).toDF("id", "v"), root2)
    LT.exportDeltaLog(spark, root2)
    val ex = intercept[IllegalArgumentException] {
      LT.readDeltaExportChanges(spark, root2, 0L, 0L)
    }
    assert(ex.getMessage.contains("change data feed is not enabled"))
  }

  test("CDF export on a hive-partitioned table lays change data out per partition") {
    import spark.implicits._
    val root = freshRoot("cdf_part")
    LT.create((0L until 40L).map(i => (i, i % 2, i * 10.0))
      .toDF("id", "k", "price"), root, partitionBy = Seq("k"))
    LT.enableChangeDataFeed(spark, root, Seq("id"))
    LT.exportDeltaLog(spark, root)
    // COW delete touching both partitions
    LT.deleteWhere(spark, root, "id < 4", partitionBy = Seq("k"))
    val logTxt = Files.readString(
      Paths.get(root, "_delta_log", f"${2L}%020d.json"))
    // cdc actions carry their hive partition values
    assert(logTxt.contains(""""cdc""""))
    assert(logTxt.contains(""""partitionValues":{"k":"0"}"""))
    assert(logTxt.contains(""""partitionValues":{"k":"1"}"""))
    import scala.jdk.CollectionConverters._
    val cdcFiles = Files.walk(Paths.get(root, "_change_data"))
      .iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq
    assert(cdcFiles.forall(p =>
      p.getParent.getFileName.toString.startsWith("k=")),
      s"cdc files must live under hive dirs: $cdcFiles")
    val ch = LT.readDeltaExportChanges(spark, root, 2L, 2L)
    assert(ch.select(col("id").cast("long"), col("k").cast("long"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (1L, 1L), (2L, 0L), (3L, 1L)))
    assert(ch.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("delete"))
  }

  test("Iceberg equality deletes: key matching, strict sequence scoping, import refusal") {
    import spark.implicits._
    import graft.sources.IcebergMeta
    val root = freshRoot("eqdel")
    // two data snapshots: create (seq 1) and append (seq 2)
    LT.create((0L until 10L).map(i => (i, s"a$i")).toDF("id", "v"), root)
    LT.append((10L until 20L).map(i => (i, s"b$i")).toDF("id", "v"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    // foreign equality delete at seq 3: ids 3 and 12 disappear
    IcebergMeta.appendEqualityDeleteSnapshot(spark, root, Seq("id"),
      Seq(3L, 12L).toDF("id"))
    val got = IcebergMeta.readIceberg(spark, root)
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == (0L until 20L).filterNot(Set(3L, 12L)), got)
    // STRICT scoping: a delete crafted at seq 2 (a concurrent foreign
    // commit) applies to seq-1 files only — id 5 (created, seq 1) dies,
    // id 15 (appended, seq 2: NOT strictly smaller) survives
    IcebergMeta.appendEqualityDeleteSnapshot(spark, root, Seq("id"),
      Seq(5L, 15L).toDF("id"), seqOverride = Some(2L))
    val got2 = IcebergMeta.readIceberg(spark, root)
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got2 == (0L until 20L).filterNot(Set(3L, 12L, 5L)), got2)
    // multi-column keys resolve through equality_ids → names
    val root2 = freshRoot("eqdel2")
    LT.create(Seq((1L, "x", 1.0), (1L, "y", 2.0), (2L, "x", 3.0))
      .toDF("k1", "k2", "p"), root2)
    IcebergMeta.exportIcebergMeta(spark, root2)
    IcebergMeta.appendEqualityDeleteSnapshot(spark, root2, Seq("k1", "k2"),
      Seq((1L, "x")).toDF("k1", "k2"))
    assert(IcebergMeta.readIceberg(spark, root2)
      .select("p").orderBy("p").collect().map(_.getDouble(0)).toSeq ==
      Seq(2.0, 3.0))
    // import refuses equality-delete-bearing chains instead of
    // resurrecting deleted rows
    val ex = intercept[IllegalArgumentException] {
      IcebergMeta.convertToGraft(spark, root2, freshRoot("eqdel_dst"))
    }
    assert(ex.getMessage.contains("equality-delete"), ex.getMessage)
  }

  test("CDF configuration survives the auto-checkpoint (conf seeds from checkpoint metaData)") {
    import spark.implicits._
    val root = freshRoot("cdf_ckpt")
    LT.create(Seq((0L, "a")).toDF("id", "v"), root)
    LT.enableChangeDataFeed(spark, root, Seq("id"))   // v1
    LT.exportDeltaLog(spark, root)
    // write-through hook checkpoints at v10; later ranges replay ONLY the
    // post-checkpoint JSON tail, which carries no metaData action — the
    // CDF flag must ride the checkpoint's metaData.configuration
    (2L to 11L).foreach(i =>
      LT.append(Seq((i, s"x$i")).toDF("id", "v"), root))
    assert(Files.exists(Paths.get(root, "_delta_log",
      f"${10L}%020d.checkpoint.parquet")))
    val ins = LT.readDeltaExportChanges(spark, root, 11L, 11L)
    assert(ins.select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("insert", 11L)))
    // a post-checkpoint COW delete still records (and reads back) cdc
    LT.deleteWhere(spark, root, "id = 3")               // v12
    assert(LT.readDeltaExportChanges(spark, root, 12L, 12L)
      .select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("delete", 3L)))
  }

  test("CDF range refuses versions below the enabling commit; foreign OPTIMIZE derives nothing") {
    import spark.implicits._
    val root = freshRoot("cdf_preen")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), root)
    LT.deleteWhere(spark, root, "id = 1")             // v1: pre-CDF COW
    LT.enableChangeDataFeed(spark, root, Seq("id"))   // v2
    LT.exportDeltaLog(spark, root)
    // a range reaching below the enabling version must refuse: v1 is a
    // cdc-less REWRITE (remove+add), which no enabled writer produces —
    // deriving it would fabricate inserts+deletes for survivors
    val ex = intercept[IllegalArgumentException] {
      LT.readDeltaExportChanges(spark, root, 1L, 2L)
    }
    assert(ex.getMessage.contains("without recording cdc"), ex.getMessage)
    // a FOREIGN OPTIMIZE commit: add+remove with dataChange=false and no
    // cdc — spec readers derive NOTHING from it, and the file-mode
    // stream must not refuse it either
    val logDir = Paths.get(root, "_delta_log")
    val v2txt = Files.readString(logDir.resolve(f"${2L}%020d.json"))
    val dataRel = LT.manifestFiles(root, 2L).head
    Files.writeString(logDir.resolve(f"${3L}%020d.json"),
      s"""{"commitInfo":{"timestamp":99}}
{"remove":{"path":"data/$dataRel","deletionTimestamp":0,"dataChange":false}}
{"add":{"path":"data/$dataRel","partitionValues":{},"size":1,"modificationTime":0,"dataChange":false}}
""")
    assert(LT.readDeltaExportChanges(spark, root, 3L, 3L).count() == 0,
      "dataChange=false churn must derive no changes")
    assert(v2txt.contains("enableChangeDataFeed"))
  }

  test("renaming a CDF key remaps it; dropping one refuses; truncation reclaims cdc files") {
    import spark.implicits._
    val root = freshRoot("cdf_rename")
    LT.create(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "price"), root)
    LT.enableChangeDataFeed(spark, root, Seq("id"))
    LT.exportDeltaLog(spark, root)
    LT.alterRenameColumn(spark, root, "id", "doc_id")  // v2
    assert(LT.cdfKeysAt(root, 2L) == Seq("doc_id"),
      "renamed CDF key must follow the rename")
    // the next churn commit exports cdc THROUGH the renamed key — the
    // mirror must not wedge
    LT.deleteWhere(spark, root, "doc_id = 1")          // v3
    assert(Files.readString(Paths.get(root, "_delta_log",
      f"${3L}%020d.json")).contains("\"cdc\""))
    val ch = LT.readDeltaExportChanges(spark, root, 3L, 3L)
    assert(ch.select("_change_type", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("delete", 1L)))
    intercept[IllegalArgumentException] {
      LT.alterDropColumns(spark, root, Seq("doc_id"))
    }
    // log truncation reclaims the dropped versions' cdc parquet
    import scala.jdk.CollectionConverters._
    def cdcFiles(): Seq[String] =
      Files.walk(Paths.get(root, "_change_data")).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).map(_.toString).toSeq
    assert(cdcFiles().nonEmpty)
    // RESTORE past the rename must restore the epoch's CDF keys too, or
    // the next export's changeFeed references a column the rolled-back
    // schema no longer has (wedging the mirror silently)
    LT.restore(root, 1L)                               // v4: schema has 'id'
    assert(LT.cdfKeysAt(root, 4L) == Seq("id"),
      "restore must roll the CDF keys back with the schema epoch")
    // the restore commit's OWN recorded changes must be the true net
    // change under the END epoch's schema (insert of the un-deleted row),
    // not fabricated delete+insert pairs from aligning the pre side by
    // its old epoch's column names
    assert(LT.readDeltaExportChanges(spark, root, 4L, 4L)
      .select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("insert", 1L)))
    LT.deleteWhere(spark, root, "id = 2")              // v5: cdc via 'id'
    assert(LT.readDeltaExportChanges(spark, root, 5L, 5L)
      .select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("delete", 2L)))
    // MATERIALIZATION is the inverse trap: it REWRITES physical names
    // (logical schema unchanged, zero logical changes) — the feed across
    // it must be EMPTY, not a fabricated whole-table delete+insert from
    // mis-naming the pre side's old physical columns
    LT.alterRenameColumn(spark, root, "id", "doc_id")  // v6
    val matV = LT.materializeMapping(spark, root)      // v7: rewrite
    assert(LT.changeFeed(spark, root, matV - 1, matV,
      Seq("doc_id")).count() == 0,
      "a materialization commit has no logical changes")
    // and a range SPANNING the materialization still reports true
    // changes under the end epoch's names
    LT.deleteWhere(spark, root, "doc_id = 1")          // v8
    assert(LT.changeFeed(spark, root, matV - 1, matV + 1, Seq("doc_id"))
      .select("_change_type", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("delete", 1L)))
    (6L to 12L).foreach(i =>
      LT.append(Seq((100 + i, i.toDouble)).toDF("id", "price"), root))
    // checkpoint at v10 exists (hook cadence); vacuum truncates below it
    LT.vacuum(root, retainLast = 2)
    assert(cdcFiles().isEmpty,
      s"truncated versions' cdc files must be reclaimed: ${cdcFiles()}")
    // CDF ranges ABOVE the truncation horizon stay readable: the guard
    // is structural (per-version), not a conf replay at fromVersion that
    // would refuse the intact tail of a truncated log
    assert(LT.readDeltaExportChanges(spark, root, 11L, 12L)
      .select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
  }

  test("SQL face: ALTER TABLE ... ENABLE CHANGE DATA FEED KEYS wires the export's cdc") {
    import spark.implicits._
    import graft.sql.GraftSql
    val root = freshRoot("sql_cdf")
    LT.create(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"), root)
    GraftSql.register(spark, "cdf_sql_t", root, rowKeys = Seq("id"))
    GraftSql.sql(spark, "ALTER TABLE cdf_sql_t ENABLE CHANGE DATA FEED KEYS id")
    assert(LT.cdfKeysAt(root, LT.currentVersion(root).get) == Seq("id"))
    LT.exportDeltaLog(spark, root)
    GraftSql.sql(spark, "DELETE FROM cdf_sql_t WHERE id = 1")
    val changes = LT.readDeltaExportChanges(spark, root, 2L, 2L)
    assert(changes.select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("delete", 1L)))
    // unknown key columns refuse at ALTER time
    val ex = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "ALTER TABLE cdf_sql_t ENABLE CHANGE DATA FEED KEYS nope")
    }
    assert(ex.getMessage.contains("not in"))
  }

  test("shallow clone carries CDF enablement; DESCRIBE DETAIL reports it") {
    import spark.implicits._
    import graft.sql.GraftSql
    val root = freshRoot("cdf_clone")
    LT.create(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "price"), root)
    LT.enableChangeDataFeed(spark, root, Seq("id"))
    GraftSql.register(spark, "cdf_clone_src", root, rowKeys = Seq("id"))
    val d = GraftSql.sql(spark,
      "DESCRIBE DETAIL cdf_clone_src").collect()(0)
    assert(d.getString(d.fieldIndex("change_data_feed")) ==
      "enabled; keys id")
    // a clone keeps recording changes (Delta clone semantics: table
    // properties carry over)
    val dstRoot = freshRoot("cdf_clone_dst")
    LT.cloneTable(spark, root, dstRoot)
    assert(LT.cdfKeysAt(dstRoot, 0L) == Seq("id"),
      "clone must carry the CDF key list")
    LT.exportDeltaLog(spark, dstRoot)
    LT.deleteWhere(spark, dstRoot, "id = 1")
    assert(LT.readDeltaExportChanges(spark, dstRoot, 1L, 1L)
      .select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("delete", 1L)))
  }

  test("iceberg-export startingTimestamp tails from the first snapshot at/after the stamp") {
    import spark.implicits._
    import graft.sources.IcebergMeta
    val root = freshRoot("ice_start_ts")
    LT.create(Seq((1L, "a")).toDF("id", "v"), root)
    LT.append(Seq((2L, "b")).toDF("id", "v"), root)
    LT.append(Seq((3L, "c")).toDF("id", "v"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    val snaps = IcebergMeta.snapshots(root)
    val tz = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    val stamp = java.time.Instant.ofEpochMilli(snaps(1).ts).atZone(tz)
      .toLocalDateTime.toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = java.nio.file.Files.createTempDirectory("ice-ts-ck").toString
    val q = spark.readStream.format("iceberg-export")
      .option("path", root).option("startingTimestamp", stamp).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => got.add(r.getLong(0))); ()
      }.start()
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    // inclusive at the middle snapshot's own stamp: rows 2 and 3, no
    // snapshot batch for row 1
    assert(got.asScala.toSet == Set(2L, 3L), got.asScala.toSeq.toString)
  }

  test("readIceberg asOfTimestamp resolves through the chain's snapshot stamps") {
    import spark.implicits._
    import graft.sources.IcebergMeta
    val root = freshRoot("ice_ts")
    LT.create(Seq((1L, "a")).toDF("id", "v"), root)
    LT.append(Seq((2L, "b")).toDF("id", "v"), root)
    LT.append(Seq((3L, "c")).toDF("id", "v"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    val snaps = IcebergMeta.snapshots(root)
    assert(snaps.size == 3)
    // pin at the middle snapshot's own stamp AND between stamps
    assert(IcebergMeta.readIceberg(spark, root,
      asOfTimestamp = Some(snaps(1).ts)).count() == 2)
    assert(IcebergMeta.readIceberg(spark, root,
      asOfTimestamp = Some(snaps(2).ts - 1)).count() == 2)
    assert(IcebergMeta.readIceberg(spark, root,
      asOfTimestamp = Some(Long.MaxValue)).count() == 3)
    intercept[IllegalArgumentException] {
      IcebergMeta.readIceberg(spark, root,
        asOfTimestamp = Some(snaps(0).ts - 1))
    }
    intercept[IllegalArgumentException] {
      IcebergMeta.readIceberg(spark, root, snapshotAsOf = Some(snaps(0).id),
        asOfTimestamp = Some(snaps(0).ts))
    }
  }

  test("Iceberg export fails loudly on an unreadable data-file footer (no record_count=0)") {
    import spark.implicits._
    import graft.sources.IcebergMeta
    val root = freshRoot("iceberg_footer")
    LT.create(Seq((0L, "a"), (1L, "b")).toDF("id", "v"), root)
    // corrupt the single data file's footer AFTER commit: the export's
    // row-count read must throw, not silently write record_count=0
    val dataDir = Paths.get(root, "data")
    import scala.jdk.CollectionConverters._
    val pq = Files.walk(dataDir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.head
    val orig = Files.readAllBytes(pq)
    Files.write(pq, Array.fill[Byte](8)(0x2a))
    intercept[Exception] { IcebergMeta.exportIcebergMeta(spark, root) }
    // the failure was not cached: restoring the file lets export succeed
    Files.write(pq, orig)
    IcebergMeta.exportIcebergMeta(spark, root)
    assert(IcebergMeta.readIceberg(spark, root).count() == 2)
  }
}
