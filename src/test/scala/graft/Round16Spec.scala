package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergMeta, LakehouseTable => LT}

/** Round-16 pins — the round-15 verdict's ranked list:
  *
  *  1. Iceberg reader-side format-version gate: a v1 or v3 chain
  *     refuses LOUDLY with the version named on EVERY read entry
  *     (readIceberg, time travel, changelog, the inspection TVFs, the
  *     streaming source's snapshot probe, convertToGraft) — the
  *     Iceberg twin of requireDeltaReaderProtocol. v3 read support is
  *     deliberately struck: the refusal names the remedy.
  *  2. ADVICE closures: a git-style branch name ('release/1.0')
  *     advances the REAL ref on a branch commit (no JSON-Pointer
  *     nesting); hazardous ref names refuse at creation; vacuum runs
  *     the full writer-protocol gate (the vacuumProtocolCheck
  *     obligation) while the feature itself no longer refuses
  *     reads/writes; a corrupt v2-checkpoint JSON top refuses
  *     (FAILFAST) instead of silently dropping actions from seeding;
  *     incremental exports carry manifest-list partition summaries in
  *     memory — a carried manifest's summaries survive without the
  *     manifest avro ever being re-opened.
  */
class Round16Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/r16_$name"
    val p = Paths.get(r)
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(p)
    r
  }

  private def wipeManifest(root: String): Unit = {
    val walked = Files.walk(Paths.get(root, "_manifest"))
    try walked.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
    finally walked.close()
  }

  /** Commit a doctored copy of the chain's current metadata with
    * `format-version` rewritten to `ver`, hint bumped — the shape a
    * foreign v1/v3 writer would leave behind. */
  private def doctorFormatVersion(root: String, ver: Int): Unit = {
    val dir = Paths.get(root, "metadata")
    val n = Files.readString(dir.resolve("version-hint.text")).trim.toLong
    val md = om.readTree(Files.readString(
      dir.resolve(s"v$n.metadata.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    md.put("format-version", ver)
    Files.writeString(dir.resolve(s"v${n + 1}.metadata.json"), md.toString)
    Files.writeString(dir.resolve("version-hint.text"), (n + 1).toString)
  }

  private def icebergChain(name: String): String = {
    import spark.implicits._
    val root = freshRoot(name)
    LT.create((0 until 8).map(i => (i.toLong, i % 2)).toDF("k", "part")
      .coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    root
  }

  test("a v3 Iceberg chain refuses on every read entry, version named") {
    val root = icebergChain("fmtv3")
    val sid = IcebergMeta.snapshots(root).last.id
    doctorFormatVersion(root, 3)
    def refuses(what: String)(body: => Any): Unit = {
      val ex = intercept[IllegalArgumentException](body)
      assert(ex.getMessage.contains("format-version 3"),
        s"$what: ${ex.getMessage}")
      // the strike is documented in the refusal: the owner's remedy
      assert(ex.getMessage.contains("rewrite"), s"$what: ${ex.getMessage}")
    }
    refuses("readIceberg") { IcebergMeta.readIceberg(spark, root).count() }
    refuses("time travel") {
      IcebergMeta.readIceberg(spark, root, snapshotAsOf = Some(sid)).count()
    }
    refuses("changelog") {
      IcebergMeta.icebergChangelog(spark, root, 0L, 1L, Seq("k")).count()
    }
    refuses("snapshots TVF") { IcebergMeta.snapshotsDf(spark, root).count() }
    refuses("manifests TVF") { IcebergMeta.manifestsDf(spark, root).count() }
    refuses("files TVF") { IcebergMeta.filesDf(spark, root).count() }
    // the streaming source's per-trigger offset probe
    refuses("snapshot probe") { IcebergMeta.snapshots(root) }
    refuses("convertToGraft") {
      IcebergMeta.convertToGraft(spark, root, freshRoot("fmtv3_dst"))
    }
  }

  test("a v1 Iceberg chain refuses reads too (sequence rules differ)") {
    val root = icebergChain("fmtv1")
    doctorFormatVersion(root, 1)
    val ex = intercept[IllegalArgumentException] {
      IcebergMeta.readIceberg(spark, root).count()
    }
    assert(ex.getMessage.contains("format-version 1"), ex.getMessage)
    assert(ex.getMessage.contains("sequence numbers"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      IcebergMeta.filesDf(spark, root).count()
    }
    assert(ex2.getMessage.contains("format-version 1"), ex2.getMessage)
  }

  test("a git-style branch name advances the real ref, not a nested node") {
    import spark.implicits._
    val root = icebergChain("slashref")
    val base = IcebergMeta.snapshots(root).last.id
    IcebergMeta.createRefForeign(root, "release/1.0", base, "branch")
    val staged = IcebergMeta.appendIcebergForeign(spark, root,
      (8 until 12).map(i => (i.toLong, i % 2)).toDF("k", "part")
        .coalesce(1), branch = Some("release/1.0"))
    val dir = Paths.get(root, "metadata")
    val n = Files.readString(dir.resolve("version-hint.text")).trim.toLong
    val refs = om.readTree(Files.readString(
      dir.resolve(s"v$n.metadata.json"))).get("refs")
    // the REAL key advanced; JSON-Pointer interpretation would have
    // minted a nested refs.release object and left the ref behind
    assert(refs.get("release/1.0") != null, refs.toString)
    assert(refs.get("release/1.0").get("snapshot-id").asLong() == staged,
      refs.toString)
    assert(refs.get("release") == null,
      s"pointer-style nesting leaked: $refs")
    // main untouched until publish; fast-forward then serves the append
    assert(IcebergMeta.readIceberg(spark, root).count() == 8)
    IcebergMeta.fastForwardForeign(root, "release/1.0")
    assert(IcebergMeta.readIceberg(spark, root).count() == 12)
    // hazardous names refuse at creation, loudly
    val bad = intercept[IllegalArgumentException] {
      IcebergMeta.createRefForeign(root, "has space", staged, "tag")
    }
    assert(bad.getMessage.contains("has space"), bad.getMessage)
  }

  test("vacuumProtocolCheck: reads/writes tolerate it, vacuum runs the gate") {
    import spark.implicits._
    val root = freshRoot("vacpc")
    LT.create((0 until 6).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    val lf0 = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    def doctor(protocolJson: String): Unit = {
      val doctored = Files.readString(lf0).replaceAll(
        """"protocol":\{[^}]*\}""", s""""protocol":$protocolJson""")
      assert(doctored.contains(protocolJson.take(30)), "doctor must apply")
      Files.writeString(lf0, doctored)
    }
    doctor("""{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["vacuumProtocolCheck"],"writerFeatures":["vacuumProtocolCheck"]}""")
    // the feature's reader obligation is nil — read and append serve
    assert(LT.readDeltaExport(spark, root).count() == 6)
    LT.appendDeltaForeign(spark, root,
      Seq((6L, "v6")).toDF("k", "s").coalesce(1))
    assert(LT.readDeltaExport(spark, root).count() == 7)
    // a fresh vacuum is a no-op sweep, not a refusal
    assert(LT.vacuumDeltaForeign(spark, root, retainHours = 168.0,
      explicitRetain = true).isEmpty)
    // an UNKNOWN writer feature refuses VACUUM (it may reference files
    // this replay does not parse; deleting past it is data loss) while
    // the read face still serves
    doctor("""{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["vacuumProtocolCheck"],"writerFeatures":["futureMagic"]}""")
    assert(LT.readDeltaExport(spark, root).count() == 7)
    val ex = intercept[IllegalArgumentException] {
      LT.vacuumDeltaForeign(spark, root, retainHours = 168.0,
        explicitRetain = true)
    }
    assert(ex.getMessage.contains("futureMagic") &&
      ex.getMessage.contains("vacuum"), ex.getMessage)
  }

  test("a corrupt v2-checkpoint JSON top refuses instead of seeding partial") {
    import spark.implicits._
    val root = freshRoot("v2corrupt")
    LT.create((0 until 6).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    LT.appendDeltaForeign(spark, root,
      (6 until 10).map(i => (i.toLong, s"v$i")).toDF("k", "s").coalesce(1))
    LT.checkpointDeltaForeign(spark, root)
    operators.Lakehouse.rewriteCheckpointV2(spark, root, jsonTop = true)
    LT.cleanupDeltaLogForeign(root)
    // sanity: the intact v2 JSON top serves the full state
    assert(LT.readDeltaExport(spark, root).count() == 10)
    // truncate the top's LAST line mid-record — a real partial write
    val logDir = Paths.get(root, "_delta_log")
    val top = {
      val l = Files.list(logDir)
      try l.iterator().asScala
        .filter(_.getFileName.toString.matches(""".*\.checkpoint\.[^.]+\.json"""))
        .toSeq.head
      finally l.close()
    }
    val lines = Files.readString(top).split('\n')
    Files.writeString(top, (lines.dropRight(1) :+
      lines.last.take(lines.last.length / 2)).mkString("\n"))
    val ex = intercept[Exception] { LT.readDeltaExport(spark, root).count() }
    assert(ex.getMessage != null, "corrupt top must refuse, not null-fill")
  }

  test("remove_orphan_files: reclaims lost-CAS debris, spares young and referenced") {
    import spark.implicits._
    val root = freshRoot("orphans")
    LT.create((0 until 8).map(i => (i.toLong, i % 2)).toDF("k", "part")
      .coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    IcebergMeta.appendIcebergForeign(spark, root,
      (8 until 12).map(i => (i.toLong, i % 2)).toDF("k", "part").coalesce(1))
    operators.Lakehouse.plantOrphanDebris(root)
    // plus a YOUNG stray (fresh mtime): an in-flight writer's file
    val dataDir = Paths.get(root, "data")
    val aLive = {
      val l = Files.list(dataDir)
      try l.iterator().asScala.toSeq.sortBy(_.toString)
        .find(_.toString.endsWith(".parquet")).get
      finally l.close()
    }
    val young = dataDir.resolve("stray-young.parquet")
    Files.copy(aLive, young)
    val before = IcebergMeta.readIceberg(spark, root).count()
    assert(before == 12)
    val deleted = IcebergMeta.removeOrphanFilesForeign(spark, root, 24.0)
    Seq("stray-merge", "m-4242424242", "snap-4242424242",
      "delete-4242424242").foreach(tag =>
      assert(deleted.exists(_.contains(tag)),
        s"$tag not reclaimed: $deleted"))
    assert(Files.exists(young), "a young file must survive the horizon")
    assert(IcebergMeta.readIceberg(spark, root).count() == before)
    // idempotent: the second sweep finds nothing old and unreferenced
    assert(IcebergMeta.removeOrphanFilesForeign(spark, root, 24.0).isEmpty)
    // the SQL face refuses a bare call — deletion is irreversible
    val ex = intercept[Exception] {
      spark.sql(s"REMOVE ORPHAN FILES iceberg_export('$root')")
    }
    assert(ex.getMessage.contains("OLDER THAN"), ex.getMessage)
    // SQL with the horizon reclaims the stray once it has aged out
    Files.setLastModifiedTime(young,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600 * 1000))
    spark.sql(
      s"REMOVE ORPHAN FILES iceberg_export('$root') OLDER THAN 24 HOURS")
    assert(!Files.exists(young), "the aged stray must be reclaimed")
    // ref-reachable protection: tag the FIRST snapshot, expire to 1 —
    // the tagged snapshot stays in the array, so its files are
    // referenced and the sweep must not touch them
    val first = IcebergMeta.snapshots(root).head.id
    IcebergMeta.createRefForeign(root, "keep", first, "tag")
    IcebergMeta.expireSnapshotsForeign(root, retainLast = 1)
    IcebergMeta.removeOrphanFilesForeign(spark, root, 24.0)
    assert(IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(first)).count() == 8,
      "the tag-reachable snapshot must stay readable after the sweep")
  }

  private def rewriteAvroRecords(path: Path)(
      f: org.apache.avro.generic.GenericRecord => Unit): Unit = {
    val r = new org.apache.avro.file.DataFileReader(path.toFile,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val schema = r.getSchema
    val recs = r.iterator().asScala.toSeq
    r.close()
    recs.foreach(f)
    val tmp = Files.createTempFile(path.getParent, ".doct", ".avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, tmp.toFile)
    recs.foreach(w.append)
    w.close()
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING)
  }

  test("orphan sweep: URI-form manifest paths protect the same live files") {
    import spark.implicits._
    val root = freshRoot("orphanuri")
    LT.create((0 until 6).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    // doctor EVERY data-manifest entry's file_path into file:-URI form
    // (the layout normPathCol/normPathDriver exist for; reads serve it)
    val metaDir = Paths.get(root, "metadata")
    val manifests = {
      val l = Files.list(metaDir)
      try l.iterator().asScala.toSeq.filter(p =>
        p.getFileName.toString.startsWith("m-") &&
          p.getFileName.toString.endsWith(".avro"))
      finally l.close()
    }
    manifests.foreach(m => rewriteAvroRecords(m) { e =>
      val df = e.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      df.put("file_path", "file://" + df.get("file_path").toString)
    })
    assert(IcebergMeta.readIceberg(spark, root).count() == 6,
      "the URI-form chain must still read")
    // age every data file past the horizon: ONLY the normalization
    // keeps them out of the sweep now
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 72L * 3600 * 1000)
    val dataDir = Paths.get(root, "data")
    val dataFiles = {
      val l = Files.list(dataDir)
      try l.iterator().asScala.toSeq
        .filter(_.toString.endsWith(".parquet"))
      finally l.close()
    }
    dataFiles.foreach(p => Files.setLastModifiedTime(p, old))
    val deleted = IcebergMeta.removeOrphanFilesForeign(spark, root, 24.0)
    assert(deleted.isEmpty,
      s"live URI-referenced files must survive the sweep: $deleted")
    assert(IcebergMeta.readIceberg(spark, root).count() == 6)
  }

  test("a snapshots-less chain answers empty, and the mirror refuses a v3 tip") {
    import spark.implicits._
    // (a) metadata omitting the OPTIONAL snapshots array: empty, no NPE
    val root = freshRoot("nosnaps")
    val dir = Files.createDirectories(Paths.get(root, "metadata"))
    Files.writeString(dir.resolve("v1.metadata.json"),
      """{"format-version":2,"table-uuid":"00000000-0000-0000-0000-00000000aa01",""" +
        s""""location":"$root","last-sequence-number":0,"last-updated-ms":1,""" +
        """"last-column-id":1,"current-schema-id":0,""" +
        """"schemas":[{"type":"struct","schema-id":0,"fields":[{"id":1,"name":"k","required":false,"type":"long"}]}],""" +
        """"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],""" +
        """"last-partition-id":999,"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],""" +
        """"properties":{}}""")
    Files.writeString(dir.resolve("version-hint.text"), "1")
    assert(IcebergMeta.snapshots(root).isEmpty)
    assert(IcebergMeta.removeOrphanFilesForeign(spark, root, 24.0).isEmpty)
    // every inspection relation answers empty too (current-snapshot-id
    // is also optional) — never an NPE
    assert(IcebergMeta.partitionsDf(spark, root).count() == 0)
    assert(IcebergMeta.filesDf(spark, root).count() == 0)
    assert(IcebergMeta.manifestsDf(spark, root).count() == 0)
    assert(IcebergMeta.refsDf(spark, root).count() == 0)
    // (b) a graft MIRROR whose tip a foreign v3 writer took over:
    // exportIcebergMeta must refuse LOUDLY, never silently rewalk
    val mroot = freshRoot("v3tip")
    LT.create(Seq((1L, "a")).toDF("k", "s").coalesce(1), mroot)
    IcebergMeta.exportIcebergMeta(spark, mroot)
    doctorFormatVersion(mroot, 3)
    LT.append(Seq((2L, "b")).toDF("k", "s").coalesce(1), mroot)
    val ex = intercept[IllegalStateException] {
      IcebergMeta.exportIcebergMeta(spark, mroot)
    }
    assert(ex.getMessage.contains("foreign snapshots"), ex.getMessage)
  }

  test("delta_files lists each live add once, DV state flagged") {
    import spark.implicits._
    val root = freshRoot("dfiles")
    LT.create((1L to 20L).map(i => (i, s"a$i")).toDF("id", "s")
      .coalesce(1), root)
    LT.append((21L to 40L).map(i => (i, s"a$i")).toDF("id", "s")
      .coalesce(1), root)
    LT.deleteWhereMor(spark, root, "id IN (3, 5)")
    LT.exportDeltaLog(spark, root)
    val df = LT.deltaFilesDf(spark, root)
    val rows = df.collect()
    assert(rows.length == 2, rows.mkString("\n"))
    assert(rows.map(_.getString(0)).distinct.length == rows.length,
      "a DV-covered file must list ONCE")
    val dvRows = rows.filter(_.getBoolean(4))
    assert(dvRows.length == 1, rows.mkString("\n"))
    assert(dvRows.head.getLong(5) == 2L,
      "dv_cardinality is the DV's deleted-row count")
    assert(rows.map(_.getLong(1)).sum == 40L,
      "num_records is the add's PHYSICAL stats claim")
    assert(rows.forall(_.getLong(2) > 0L), "on-disk sizes")
    // the SQL face serves the same relation
    assert(spark.sql(s"SELECT count(*) AS n FROM delta_files('$root')")
      .collect().head.getLong(0) == 2L)
    // versioned census (the iceberg_files snapshot-arg parity): at v0
    // one file, 20 rows, no DV yet
    val v0 = LT.deltaFilesDf(spark, root, versionAsOf = Some(0L)).collect()
    assert(v0.length == 1 && v0.head.getLong(1) == 20L &&
      !v0.head.getBoolean(4), v0.mkString("\n"))
    assert(spark.sql(s"SELECT count(*) AS n FROM delta_files('$root', 0)")
      .collect().head.getLong(0) == 1L)
    // detail on the DV-bearing table: num_rows is LOGICAL (40 physical
    // minus the DV's 2 deleted) — the count the read path serves
    val det = LT.deltaDetailDf(spark, root).collect().head
    assert(det.getLong(1) == 38L, det.toString)
    assert(det.getLong(1) == LT.readDeltaExport(spark, root).count(),
      "detail num_rows must equal the read's own count")
  }

  test("refs/partitions/detail inspection relations read pure state") {
    import spark.implicits._
    // refs: a staged branch and a tag, distinct snapshots, then the
    // publish collapses main onto the branch head
    val root = freshRoot("refs")
    LT.create((0 until 4).map(i => (i.toLong, i % 2)).toDF("k", "part")
      .coalesce(1), root, partitionBy = Seq("part"))
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    val base = IcebergMeta.snapshots(root).last.id
    IcebergMeta.createRefForeign(root, "pin", base, "tag")
    IcebergMeta.createRefForeign(root, "stage", base, "branch")
    val staged = IcebergMeta.appendIcebergForeign(spark, root,
      (4 until 8).map(i => (i.toLong, i % 2)).toDF("k", "part")
        .coalesce(1), branch = Some("stage"))
    val refs = IcebergMeta.refsDf(spark, root).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(refs.contains(("pin", "tag", base)), refs.toString)
    assert(refs.contains(("stage", "branch", staged)), refs.toString)
    assert(refs.contains(("main", "branch", base)), refs.toString)
    IcebergMeta.fastForwardForeign(root, "stage")
    val after = IcebergMeta.refsDf(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(after("main") == staged && after("stage") == staged &&
      after("pin") == base, after.toString)
    // partitions: the census equals the read's own group-by, and a
    // PINNED snapshot serves the pre-publish census
    val parts = IcebergMeta.partitionsDf(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val expect = IcebergMeta.readIceberg(spark, root)
      .groupBy(col("part")).count().collect()
      .map(r => (s"part=${r.get(0)}", r.getLong(1))).toMap
    assert(parts == expect, s"$parts vs $expect")
    val pinned = IcebergMeta.partitionsDf(spark, root,
      snapshotAsOf = Some(base)).collect().map(_.getLong(2)).sum
    assert(pinned == 4L, pinned.toString)
    // detail: one row, counts advance with an append
    val droot = freshRoot("detail")
    LT.create((0 until 6).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .coalesce(1), droot)
    LT.exportDeltaLog(spark, droot)
    wipeManifest(droot)
    def detail() = LT.deltaDetailDf(spark, droot).collect().head
    val d0 = detail()
    assert(d0.getLong(0) == 1L && d0.getLong(1) == 6L &&
      d0.getLong(3) == 1L && d0.getString(4) == "", d0.toString)
    LT.appendDeltaForeign(spark, droot,
      Seq((6L, "v6")).toDF("k", "s").coalesce(1))
    val d1 = detail()
    assert(d1.getLong(0) == 2L && d1.getLong(1) == 7L &&
      d1.getLong(3) == 2L, d1.toString)
    assert(d1.getLong(2) > d0.getLong(2), "size grows with the append")
  }

  test("CBO joinReorder flips a pessimal star join over FOREIGN relations") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // big (20k, iceberg) ⋈ mid (5k, delta) ⋈ small (50, iceberg):
    // written big⋈mid first — the pessimal order (200k-row
    // intermediate); with the foreign rowCount attach armed,
    // joinReorder must pick big⋈small first. Zero ANALYZE calls: the
    // counts come from the chains' own metadata.
    val bigR = freshRoot("cbo_f_big")
    val midR = freshRoot("cbo_f_mid")
    val smallR = freshRoot("cbo_f_small")
    LT.create((1L to 20000L).map(i => (i, i % 50)).toDF("k", "g")
      .coalesce(1), bigR)
    IcebergMeta.exportIcebergMeta(spark, bigR); wipeManifest(bigR)
    LT.create((1L to 5000L).map(i => (i % 50, s"m$i")).toDF("g", "mv")
      .coalesce(1), midR)
    LT.exportDeltaLog(spark, midR); wipeManifest(midR)
    LT.create((1L to 50L).map(i => (i, s"s$i")).toDF("k", "sv")
      .coalesce(1), smallR)
    IcebergMeta.exportIcebergMeta(spark, smallR); wipeManifest(smallR)
    def pessimal() = IcebergMeta.readIceberg(spark, bigR)
      .join(LT.readDeltaExport(spark, midR), "g")
      .join(IcebergMeta.readIceberg(spark, smallR), "k")
    def tablesUnder(p: LogicalPlan): Set[String] = p.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths
          .map(_.toUri.getPath).collectFirst {
            case q if q.startsWith(bigR) => "big"
            case q if q.startsWith(midR) => "mid"
            case q if q.startsWith(smallR) => "small"
          }.getOrElse("?")
        case _ => "?"
      }
    }.toSet
    def innermostJoinTables(plan: LogicalPlan): Set[String] = {
      val joins = plan.collect { case j: Join => j }
      val inner = joins.filter(j => j.children.forall(
        _.collect { case x: Join => x }.isEmpty))
      assert(inner.size == 1, plan.treeString)
      tablesUnder(inner.head)
    }
    // as written (CBO off): innermost is big ⋈ mid, and NO scan
    // carries a catalogTable (the attach is conf-gated)
    val off = pessimal()
    assert(innermostJoinTables(off.queryExecution.optimizedPlan) ==
      Set("big", "mid"))
    assert(off.queryExecution.analyzed.collect {
      case lr: LogicalRelation if lr.catalogTable.isDefined => lr
    }.isEmpty, "CBO off must mean zero attach work")
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.planStats.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val reordered = pessimal().queryExecution.optimizedPlan
      assert(innermostJoinTables(reordered) == Set("big", "small"),
        reordered.treeString)
      // the attached counts are EXACT (list counts / add stats)
      val armed = pessimal().queryExecution.analyzed.collect {
        case lr: LogicalRelation if lr.catalogTable.isDefined =>
          lr.catalogTable.get.stats.get.rowCount.get.toLong
      }.sorted
      assert(armed == Seq(50L, 5000L, 20000L), armed.toString)
      // and the reorder is semantics-preserving
      assert(pessimal().count() == 50L * 100L)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("summary pruning holds at 100+ manifests (the streaming-append shape)") {
    import spark.implicits._
    val root = freshRoot("manyplan")
    LT.create((0 until 12).map(i => (i.toLong, i % 12)).toDF("k", "part")
      .coalesce(1), root, partitionBy = Seq("part"))
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    (1 to 120).foreach { i =>
      IcebergMeta.appendIcebergForeign(spark, root,
        Seq((1000L + i, i % 12)).toDF("k", "part").coalesce(1))
      ()
    }
    val all = IcebergMeta.plannedDataManifests(spark, root, None)
    assert(all.size == 121, s"expected 121 manifests, got ${all.size}")
    // part=3: the 10 appends with i%12==3 + the create manifest (its
    // summary spans parts 0..11, so it survives conservatively)
    val kept = IcebergMeta.plannedDataManifests(spark, root,
      Some("part = 3"))
    assert(kept.size == 11, s"expected 11 kept, got ${kept.size}")
    val n = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("part = 3")).count()
    assert(n == 11L, n.toString) // 1 create row + 10 appends
    // the summary-stripped twin keeps everything (conservative), and
    // serves the identical result
    operators.Lakehouse.stripManifestListSummaries(root)
    assert(IcebergMeta.plannedDataManifests(spark, root,
      Some("part = 3")).size == 121)
    assert(IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("part = 3")).count() == n)
  }

  test("incremental export carries summaries without re-opening manifests") {
    import spark.implicits._
    val root = freshRoot("sumcarry")
    LT.create((0 until 8).map(i => (i.toLong, i % 2)).toDF("k", "part")
      .coalesce(1), root, partitionBy = Seq("part"))
    IcebergMeta.exportIcebergMeta(spark, root)
    val dir = Paths.get(root, "metadata")
    def dataManifests(): Seq[Path] = {
      val l = Files.list(dir)
      try l.iterator().asScala.toSeq
        .filter(_.getFileName.toString.matches("m-.*\\.avro"))
      finally l.close()
    }
    val oldManifests = dataManifests()
    assert(oldManifests.nonEmpty)
    // hide every historical manifest: if the incremental export's list
    // rebuild re-opened any of them, the summaries would degrade to
    // null (the conservative fallback) — carrying them in memory is
    // the only way this stays lossless
    val hidden = oldManifests.map { m =>
      val h = m.getParent.resolve(m.getFileName.toString + ".hidden")
      Files.move(m, h, StandardCopyOption.ATOMIC_MOVE)
      (h, m)
    }
    // a fresh session holds no summary cache — without the in-memory
    // carry, the rebuild would now recompute (and, manifests hidden,
    // degrade the carried entries to null summaries)
    IcebergMeta.mfPartSummaryCache.clear()
    try {
      LT.append((8 until 16).map(i => (i.toLong, i % 2)).toDF("k", "part")
        .coalesce(1), root, partitionBy = Seq("part"))
      IcebergMeta.exportIcebergMeta(spark, root)
    } finally hidden.foreach { case (h, m) =>
      Files.move(h, m, StandardCopyOption.ATOMIC_MOVE)
    }
    val tip = IcebergMeta.snapshots(root).last
    val in = new org.apache.avro.file.DataFileReader(
      Paths.get(tip.manifestList).toFile,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val recs = try in.iterator().asScala.toSeq finally in.close()
    assert(recs.size >= 2, s"expected carried + new manifests: ${recs.size}")
    recs.foreach { r =>
      val parts = r.get("partitions")
      assert(parts != null &&
        parts.asInstanceOf[java.util.List[_]].size() > 0,
        s"summaries lost on ${r.get("manifest_path")}")
    }
    // and the carried summaries still PRUNE: part=0 files only
    val pruned = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("part = 0"))
    assert(pruned.count() == 8)
  }
}
