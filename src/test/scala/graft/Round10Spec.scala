package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergMeta, LakehouseTable => LT}

/** Round-10 pins, closing the round-9 ADVICE findings:
  *
  *  1. Equality-delete sequence scoping must normalize the manifest's
  *     file_path with the SAME transform as the scan-side `__p` —
  *     foreign chains storing URI-form paths must still have their
  *     deletes APPLIED (pre-fix: the seq join missed, `null < dseq`
  *     was null, and the anti-join silently resurrected deleted rows).
  *  2. A foreign-extended chain (equality-delete snapshot appended past
  *     graft numbering): re-export is a no-op while current, and
  *     REFUSES loudly once un-exported graft commits exist — never the
  *     silent rewalk that collided with (and then pointed at) stale
  *     foreign metadata.
  *  3. Equality-delete application refuses with a clear error when the
  *     delete file lacks the logical key column (the active-column-
  *     mapping / physical-name case), instead of an unresolved-column
  *     analysis failure.
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/r10_$name"
    val p = Paths.get(r)
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(p)
    r
  }

  // --- generic avro surgery (simulating a FOREIGN writer's file forms) ---

  private def readAvroFull(p: Path)
      : (Schema, Seq[(String, String)], Seq[GenericRecord]) = {
    val rdr = new DataFileReader[GenericRecord](
      p.toFile, new GenericDatumReader[GenericRecord]())
    try {
      val schema = rdr.getSchema
      val metas = rdr.getMetaKeys.asScala.toSeq
        .filterNot(_.startsWith("avro."))
        .map(k => k -> rdr.getMetaString(k))
      (schema, metas, rdr.iterator().asScala.toVector)
    } finally rdr.close()
  }

  private def writeAvroFull(p: Path, schema: Schema,
      metas: Seq[(String, String)], recs: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    metas.foreach { case (k, v) => w.setMeta(k, v) }
    val tmp = Files.createTempFile(p.getParent, ".mtmp", ".avro")
    w.create(schema, tmp.toFile)
    recs.foreach(w.append)
    w.close()
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Rewrite every data manifest's data_file.file_path through `f` —
    * what a foreign engine that records URI-form paths produces. */
  private def rewriteDataManifestPaths(root: String)(f: String => String): Unit = {
    val dir = Paths.get(root, "metadata")
    val lists = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("snap-")).toSeq
    val dataManifests = lists.flatMap { l =>
      readAvroFull(l)._3
        .filter(r => r.get("content").asInstanceOf[Int] == 0)
        .map(r => Paths.get(r.get("manifest_path").toString))
    }.distinct
    assert(dataManifests.nonEmpty, "no data manifests found to rewrite")
    dataManifests.foreach { m =>
      val (schema, metas, recs) = readAvroFull(m)
      recs.foreach { r =>
        val dfr = r.get("data_file").asInstanceOf[GenericRecord]
        dfr.put("file_path", f(dfr.get("file_path").toString))
      }
      writeAvroFull(m, schema, metas, recs)
    }
  }

  private def eqDelChain(name: String): String = {
    import spark.implicits._
    val root = freshRoot(name)
    LT.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), root)
    LT.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    IcebergMeta.appendEqualityDeleteSnapshot(spark, root, Seq("id"),
      Seq(2L, 4L).toDF("id"))
    root
  }

  test("equality deletes apply on URI-form (foreign) manifest file paths") {
    import spark.implicits._
    val root = eqDelChain("eqdel_uri")
    // sanity: raw-path form applies the delete
    assert(IcebergMeta.readIceberg(spark, root)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
    // foreign writers record file: URIs in manifests; the seq-scoping
    // join must normalize them like the scan-side _metadata path or the
    // deletes silently fail open
    rewriteDataManifestPaths(root)(p => "file://" + p)
    assert(IcebergMeta.readIceberg(spark, root)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
  }

  test("foreign-extended chain: no-op re-export while current, loud refusal after a graft commit") {
    import spark.implicits._
    val root = eqDelChain("eqdel_hint")
    val hint = Paths.get(root, "metadata", "version-hint.text")
    assert(Files.readString(hint).trim == "3")
    assert(IcebergMeta.snapshots(root).size == 3)
    // idempotent re-export on a current chain: NO-OP — the hint must
    // not regress past the foreign snapshot (pre-fix it rewalked and
    // rewrote the hint to 2, dropping the foreign delete)
    IcebergMeta.exportIcebergMeta(spark, root)
    assert(Files.readString(hint).trim == "3")
    assert(IcebergMeta.snapshots(root).size == 3)
    // a NEW graft commit makes the chain un-extendable: numbering now
    // realigns (hint-1 == vs.last) so only snapshot IDENTITY catches it
    LT.append(Seq((9L, "z")).toDF("id", "v"), root)
    val ex = intercept[IllegalStateException] {
      IcebergMeta.exportIcebergMeta(spark, root)
    }
    assert(ex.getMessage.contains("foreign snapshots"), ex.getMessage)
    // the refusal left the chain untouched
    assert(Files.readString(hint).trim == "3")
    assert(IcebergMeta.snapshots(root).size == 3)
  }

  test("iceberg changelog: MOR (position-delete) diffs arrive as row-level deletes") {
    import spark.implicits._
    val root = freshRoot("chlog_mor")
    LT.create(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("id", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root) // write-through from here
    LT.deleteWhereMor(spark, root, "id <= 2")
    val snaps = IcebergMeta.snapshots(root)
    assert(snaps.size == 2, snaps.toString)
    val ch = IcebergMeta.icebergChangelog(spark, root, 1L, 2L, Seq("id"))
    val got = ch.select($"_change_type", $"id", $"_sequence_number")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("delete", 1L, 2L), ("delete", 2L, 2L)), got.toString)
    // the full changelog from the beginning replays creation inserts too
    val all = IcebergMeta.icebergChangelog(spark, root, 0L, 2L, Seq("id"))
      .select($"_change_type", $"id").as[(String, Long)].collect()
    assert(all.count(_._1 == "insert") == 5 && all.count(_._1 == "delete") == 2,
      all.toSeq.sorted.toString)
  }

  test("iceberg changelog: a foreign equality-delete snapshot derives its deleted rows") {
    import spark.implicits._
    val root = freshRoot("chlog_eqdel")
    LT.create((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), root)
    LT.append((11L to 15L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    IcebergMeta.appendEqualityDeleteSnapshot(spark, root, Seq("id"),
      Seq(2L, 4L, 11L).toDF("id"))
    val eqSeq = IcebergMeta.snapshots(root).last.seq
    val ch = IcebergMeta.icebergChangelog(spark, root, eqSeq - 1, eqSeq, Seq("id"))
    val got = ch.select($"_change_type", $"id").as[(String, Long)].collect().toSet
    assert(got == Set(("delete", 2L), ("delete", 4L), ("delete", 11L)),
      got.toString)
  }

  test("readDeltaExportChanges plans ONE cdc scan leg regardless of range length") {
    import spark.implicits._
    val root = freshRoot("cdf_one_scan")
    LT.create(Seq((1L, 0L)).toDF("id", "x").coalesce(1), root)
    LT.enableChangeDataFeed(spark, root, Seq("id"))
    LT.exportDeltaLog(spark, root) // write-through from here on
    // 8 churn commits, each recording cdc (merge rewrites = update images)
    (1L to 8L).foreach { i =>
      LT.merge(spark, root, Seq((1L, i)).toDF("id", "x"), Seq("id"))
    }
    val wide = LT.readDeltaExportChanges(spark, root, 2L, 9L)
    // every version recorded cdc → the whole range is ONE parquet scan
    // (plus the broadcast stamp join), not one union leg per version
    // (string count: the scan may sit under an AQE wrapper)
    val planStr = wide.queryExecution.executedPlan.toString
    assert(planStr.split("FileScan parquet").length - 1 == 1,
      planStr.take(2000))
    // and the rows are still the per-commit truth: 8 pre/post image pairs
    val got = wide.select($"_change_type", $"x", $"_commit_version")
      .as[(String, Long, Long)].collect().toSet
    val want = (1L to 8L).flatMap(i => Seq(
      ("update_preimage", i - 1, i + 1), ("update_postimage", i, i + 1))).toSet
    assert(got == want, got.toSeq.sorted.toString)
    // timestamps stamp from each commit, non-null, non-decreasing
    val ts = wide.orderBy($"_commit_version")
      .select($"_commit_timestamp").collect().map(_.getTimestamp(0))
    assert(ts.forall(_ != null))
    assert(ts.sliding(2).forall(p => !p(0).after(p(1))))
  }

  test("ANALYZE TABLE statistics feed the CBO: rowCount + column stats on the plan, filter estimation, version-exact staleness") {
    import spark.implicits._
    import graft.sources.TableStatistics
    val root = freshRoot("analyze")
    LT.create((1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), root)
    // no stats yet: the optimized plan has no rowCount
    assert(LT.read(spark, root).queryExecution.optimizedPlan
      .stats.rowCount.isEmpty)
    val st = TableStatistics.analyze(spark, root)
    assert(st.rowCount == 1000L && st.cols.contains("id"))
    val withCbo = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.planStats.enabled" -> "true")
    val saved = withCbo.map { case (k, _) => k -> spark.conf.get(k) }
    withCbo.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val plan = LT.read(spark, root).queryExecution.optimizedPlan
      assert(plan.stats.rowCount.contains(BigInt(1000)), plan.stats.toString)
      assert(plan.stats.attributeStats.nonEmpty, plan.stats.toString)
      // column min/max + NDV drive filter selectivity: a 1% range
      // predicate estimates ~1% of rows, not the un-stat'd default
      val est = LT.read(spark, root).filter($"id" <= 10L)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(n => n >= BigInt(1) && n <= BigInt(60)), est.toString)
      // a PURE APPEND advances table-level stats EXACTLY (round 11):
      // rowCount stays armed across appends; min/max-able column stats
      // footer-merge (round 12) while string columns drop
      LT.append(Seq((1001L, "x")).toDF("id", "v"), root)
      assert(LT.read(spark, root).queryExecution.optimizedPlan
        .stats.rowCount.contains(BigInt(1001)))
      val postAppend = LT.read(spark, root).queryExecution.optimizedPlan
        .stats.attributeStats
      assert(postAppend.keySet.map(_.name) == Set("id"),
        postAppend.toString)
      assert(postAppend.find(_._1.name == "id")
        .exists(_._2.max.contains(1001L)), postAppend.toString)
      // a DELETE still un-arms (version-exact: removed rows are not
      // knowable from the commit alone)
      LT.deleteWhere(spark, root, "id = 1001")
      assert(LT.read(spark, root).queryExecution.optimizedPlan
        .stats.rowCount.isEmpty)
      // re-analyze re-arms at the new version
      TableStatistics.analyze(spark, root)
      assert(LT.read(spark, root).queryExecution.optimizedPlan
        .stats.rowCount.contains(BigInt(1000)))
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
    // CBO off (the default): attachment is inert — same analyzed plan
    // SHAPE as an un-analyzed read (stats ride the relation only)
    val a = LT.read(spark, root).filter($"id" <= 10L)
      .queryExecution.executedPlan.toString
    assert(a.contains("FileScan parquet"))
  }

  test("ANALYZE TABLE through the SQL face") {
    import spark.implicits._
    val root = freshRoot("analyze_sql")
    LT.create((1L to 50L).map(i => (i, i * 2.0)).toDF("k", "x").coalesce(1),
      root)
    graft.sql.GraftSql.register(spark, "r10_stats_t", root)
    val row = spark.sql(
      "ANALYZE TABLE r10_stats_t COMPUTE STATISTICS FOR ALL COLUMNS").head()
    assert(row.getLong(0) == 50L && row.getLong(1) == 2L, row.toString)
    val st = graft.sources.TableStatistics.statsOf(root).get
    assert(st.cols("k").min.contains("1") && st.cols("k").max.contains("50"))
    assert(st.cols("k").distinctCount.exists(_ >= 45L)) // HLL approx of 50
    spark.sql("DROP TABLE r10_stats_t")
  }

  test("wide-history stress: 60 commits through BOTH mirrors with CDF on — faces, changes, truncation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = freshRoot("wide")
    LT.create(Seq((1L, 0L)).toDF("id", "x").coalesce(1), root)
    LT.enableChangeDataFeed(spark, root, Seq("id"))
    LT.exportDeltaLog(spark, root)      // write-through from here on
    IcebergMeta.exportIcebergMeta(spark, root)
    // 60 commits — appends, periodic COW merges (cdc update images),
    // periodic MOR deletes (DV churn) — spanning SIX delta checkpoint
    // cadences, both mirror hooks advancing incrementally per commit
    (1 to 60).foreach { i =>
      if (i % 12 == 0)
        LT.merge(spark, root, Seq((1L, i.toLong)).toDF("id", "x"), Seq("id"))
      else if (i % 17 == 0)
        LT.deleteWhereMor(spark, root, s"id = ${100 + i - 1}")
      else
        LT.append(Seq(((100 + i).toLong, i.toLong)).toDF("id", "x")
          .coalesce(1), root)
    }
    val vCur = LT.currentVersion(root).get
    assert(vCur == 61L, vCur.toString)
    // both faces serve the exact final state after the full history
    val want = LT.read(spark, root).orderBy("id", "x")
      .as[(Long, Long)].collect().toSeq
    assert(LT.readDeltaExport(spark, root).orderBy("id", "x")
      .as[(Long, Long)].collect().toSeq == want)
    assert(IcebergMeta.readIceberg(spark, root).orderBy("id", "x")
      .as[(Long, Long)].collect().toSeq == want)
    // the recorded changes over the WHOLE range maintain the q196-style
    // signed-delta aggregate to the exact final state
    val ch = LT.readDeltaExportChanges(spark, root, 2L, vCur)
    val up = col("_change_type").isin("insert", "update_postimage")
    val base = LT.readDeltaExport(spark, root, versionAsOf = Some(1L))
      .agg(count(lit(1)).as("n0"), sum(col("x")).as("s0")).collect()(0)
    val d = ch.agg(
      sum(when(up, 1L).otherwise(-1L)).as("dn"),
      sum(when(up, col("x")).otherwise(-col("x"))).as("ds")).collect()(0)
    assert(base.getLong(0) + d.getLong(0) == want.size.toLong)
    assert(base.getLong(1) + d.getLong(1) == want.map(_._2).sum)
    // Iceberg changelog parity with the Delta cdc records, row for row,
    // across the ENTIRE 60-commit history (sequence = version + 1)
    val dSet = ch.select(col("_change_type"), col("id"), col("x"),
        col("_commit_version"))
      .as[(String, Long, Long, Long)].collect().toSet
    val iSet = IcebergMeta.icebergChangelog(spark, root, 2L, vCur + 1,
        Seq("id"))
      .select(col("_change_type"), col("id"), col("x"),
        (col("_sequence_number") - lit(1L)).as("v"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(iSet == dSet,
      s"iceberg-only=${(iSet -- dSet).toSeq.sorted.take(5)} " +
        s"delta-only=${(dSet -- iSet).toSeq.sorted.take(5)}")
    // TRUNCATION interplay: vacuum retains a tail; the checkpoint-seeded
    // log read and the chain read still serve the exact state, the
    // retained change range still reads, and a below-horizon range
    // REFUSES loudly instead of serving a partial feed
    LT.vacuum(root, retainLast = 15)
    assert(LT.readDeltaExport(spark, root).orderBy("id", "x")
      .as[(Long, Long)].collect().toSeq == want)
    assert(IcebergMeta.readIceberg(spark, root).orderBy("id", "x")
      .as[(Long, Long)].collect().toSeq == want)
    assert(LT.readDeltaExportChanges(spark, root, vCur - 5, vCur)
      .count() > 0)
    val ex = intercept[IllegalArgumentException] {
      LT.readDeltaExportChanges(spark, root, 2L, vCur).count()
    }
    assert(ex.getMessage.contains("no exported log version"), ex.getMessage)
  }

  test("equality-delete file lacking the logical key column refuses clearly") {
    val root = eqDelChain("eqdel_mapped")
    val dir = Paths.get(root, "metadata")
    val delFile = Files.list(dir).iterator().asScala
      .find(_.getFileName.toString.startsWith("eqdelete-")).get
    // simulate a physical-name (column-mapped) delete file
    val stage = Files.createTempDirectory(dir, ".stage")
    spark.read.parquet(delFile.toString)
      .withColumnRenamed("id", "col_7f3a")
      .coalesce(1).write.mode("overwrite")
      .parquet(stage.resolve("out").toString)
    val part = Files.list(stage.resolve("out")).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.move(part, delFile, StandardCopyOption.REPLACE_EXISTING)
    val ex = intercept[IllegalArgumentException] {
      IcebergMeta.readIceberg(spark, root).collect()
    }
    assert(ex.getMessage.contains("lacks column"), ex.getMessage)
  }
}
