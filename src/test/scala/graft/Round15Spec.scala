package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergMeta, LakehouseTable => LT}

/** Round-15 pins — the round-14 verdict's ranked list:
  *
  *  1. Non-classic Delta checkpoints are SAFE: `_last_checkpoint` is
  *     fully parsed (version + parts), multi-part and v2 (UUID-named,
  *     parquet or JSON top + sidecars) checkpoints READ on every
  *     seeding path (state, tombstones, txn watermarks), and an
  *     advertised-but-unresolvable checkpoint refuses LOUDLY instead
  *     of silently seeding empty state (the vacuum data-loss class).
  *  2. Reader-feature validation: a reader-v3 table declaring a
  *     feature outside the implemented set refuses on read AND write
  *     (Delta table-features spec); the implemented set reads fine.
  *  3. ADVICE closures: unparseable deletedFileRetentionDuration
  *     refuses at SET time and at maintenance time (never a silent
  *     168 h substitute); id-less name-mapping entries don't NPE
  *     appends; case-variant USER property keys are not duplicates
  *     (delta.* keys still are, case-insensitively).
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/r15_$name"
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

  // ---- non-classic checkpoint scaffolding ---------------------------------

  private def classicCkpt(root: String): (Long, Path) = {
    val logDir = Paths.get(root, "_delta_log")
    val v = om.readTree(Files.readString(
      logDir.resolve("_last_checkpoint"))).get("version").asLong()
    (v, logDir.resolve(f"$v%020d.checkpoint.parquet"))
  }

  /** Rewrite the chain's classic checkpoint as a spec multi-part one —
    * the fixture module's rewriter (one body, no test-side copy). */
  private def toMultipart(root: String, parts: Int): Long = {
    val (v, _) = classicCkpt(root)
    operators.Lakehouse.splitCheckpointMultipart(spark, root, parts)
    v
  }

  /** Rewrite the chain's classic checkpoint as a spec v2 one — the
    * fixture module's rewriter (one body, no test-side copy). */
  private def toV2(root: String, jsonTop: Boolean): Long =
    operators.Lakehouse.rewriteCheckpointV2(spark, root, jsonTop)

  /** A foreign chain with a tombstone (delete strands a file), a txn
    * watermark, and a fresh checkpoint — the state every non-classic
    * layout must carry through log cleanup. */
  private def checkpointedChain(name: String): String = {
    import spark.implicits._
    val root = freshRoot(name)
    LT.create(Seq.range(1L, 11L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    LT.appendDeltaForeign(spark, root,
      Seq((11L, 110L)).toDF("k", "v").coalesce(1),
      txn = Some(7L), txnApp = "sink")
    LT.deleteDeltaForeign(spark, root, "k <= 5") // strands a data file
    LT.checkpointDeltaForeign(spark, root)
    root
  }

  /** The assertions every layout shares: reads exact, tombstone
    * protects through vacuum, txn watermark intact — all AFTER log
    * cleanup removed the JSON tail that carried them. */
  private def assertCheckpointCarries(root: String): Unit = {
    assert(LT.cleanupDeltaLogForeign(root) > 0,
      "cleanup must reclaim the JSON tail below the pointer")
    val rows = LT.readDeltaExport(spark, root)
      .select("k").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    assert(rows == (6L to 11L), s"post-cleanup read must serve: $rows")
    assert(LT.lastTxnDeltaForeign(spark, root, "sink").contains(7L),
      "the txn watermark must seed from the checkpoint")
    // backdate data files: only the checkpoint-carried tombstone can
    // protect the stranded (removed) file inside its window now
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 400L * 3600 * 1000)
    val s = Files.walk(Paths.get(root, "data"))
    try s.iterator().asScala.filter(Files.isRegularFile(_))
      .foreach(Files.setLastModifiedTime(_, old))
    finally s.close()
    assert(LT.vacuumDeltaForeign(spark, root, retainHours = 168.0,
      explicitRetain = true).isEmpty,
      "the checkpoint-carried tombstone must protect the stranded file")
    val gone = LT.vacuumDeltaForeign(spark, root, retainHours = 0.0,
      explicitRetain = true)
    assert(gone.nonEmpty, "past the window the stranded file reclaims")
    assert(LT.readDeltaExport(spark, root).count() == 6)
  }

  // ---- 1. multi-part + v2 checkpoints --------------------------------------

  test("multi-part checkpoint: read, tombstones, and txns seed from all fragments") {
    val root = checkpointedChain("mp")
    val v = toMultipart(root, parts = 3)
    assert(!Files.exists(
      Paths.get(root, "_delta_log", f"$v%020d.checkpoint.parquet")))
    assertCheckpointCarries(root)
  }

  test("v2 checkpoint (parquet top + sidecar): every seeding path reads it") {
    val root = checkpointedChain("v2p")
    toV2(root, jsonTop = false)
    assertCheckpointCarries(root)
  }

  test("v2 checkpoint (JSON top + sidecar): every seeding path reads it") {
    val root = checkpointedChain("v2j")
    toV2(root, jsonTop = true)
    assertCheckpointCarries(root)
  }

  test("appends keep committing on top of non-classic checkpoints") {
    import spark.implicits._
    val root = checkpointedChain("mpw")
    val v = toMultipart(root, parts = 2)
    LT.cleanupDeltaLogForeign(root)
    // the writer's pinned version sees the pointer; the commit lands
    // at pointer+1 and the seeded state is the base it validates
    val v2 = LT.appendDeltaForeign(spark, root,
      Seq((12L, 120L)).toDF("k", "v").coalesce(1))
    assert(v2 == v + 1, s"append must land at pointer+1: $v2")
    assert(LT.readDeltaExport(spark, root).count() == 7)
  }

  // ---- refusals: never silently empty ---------------------------------------

  test("a missing multi-part fragment refuses reads, vacuum, and appends LOUDLY") {
    import spark.implicits._
    val root = checkpointedChain("mpmiss")
    val v = toMultipart(root, parts = 2)
    LT.cleanupDeltaLogForeign(root)
    Files.delete(Paths.get(root, "_delta_log",
      f"$v%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    val exRead = intercept[IllegalStateException] {
      LT.readDeltaExport(spark, root).count()
    }
    assert(exRead.getMessage.contains("fragment"), exRead.getMessage)
    val exVac = intercept[IllegalStateException] {
      LT.vacuumDeltaForeign(spark, root, retainHours = 0.0,
        explicitRetain = true)
    }
    assert(exVac.getMessage.contains("refusing"), exVac.getMessage)
    val exApp = intercept[IllegalStateException] {
      LT.appendDeltaForeign(spark, root,
        Seq((12L, 120L)).toDF("k", "v").coalesce(1))
    }
    assert(exApp.getMessage.contains("refusing"), exApp.getMessage)
  }

  test("a pointer with no checkpoint file at all refuses LOUDLY") {
    val root = checkpointedChain("nofile")
    val (v, classic) = classicCkpt(root)
    LT.cleanupDeltaLogForeign(root)
    Files.delete(classic)
    val ex = intercept[IllegalStateException] {
      LT.readDeltaExport(spark, root).count()
    }
    assert(ex.getMessage.contains(s"version $v") &&
      ex.getMessage.contains("refusing"), ex.getMessage)
    // malformed pointer CONTENT refuses with the table named too
    Files.writeString(
      Paths.get(root, "_delta_log", "_last_checkpoint"), "{trunca")
    val exJson = intercept[IllegalStateException] {
      LT.readDeltaExport(spark, root).count()
    }
    assert(exJson.getMessage.contains("not parseable JSON") &&
      exJson.getMessage.contains("_delta_log"), exJson.getMessage)
  }

  test("a missing v2 sidecar refuses LOUDLY") {
    val root = checkpointedChain("scmiss")
    toV2(root, jsonTop = false)
    LT.cleanupDeltaLogForeign(root)
    val scDir = Paths.get(root, "_delta_log", "_sidecars")
    val sc = Files.list(scDir).iterator().asScala.toSeq.head
    Files.delete(sc)
    val ex = intercept[IllegalStateException] {
      LT.readDeltaExport(spark, root).count()
    }
    assert(ex.getMessage.contains("sidecar"), ex.getMessage)
  }

  // ---- 2. Iceberg manifest-list partition-summary pruning -------------------

  test("manifest-list summaries: a partition predicate OPENS fewer manifests") {
    import spark.implicits._
    val root = freshRoot("mlprune")
    // 4 appends, each a disjoint identity-partition slice → 4 data
    // manifests whose summaries carry disjoint [lower, upper] ranges
    LT.create(
      (0 until 64).map(i => (i.toLong, i / 16, s"p$i"))
        .toDF("k", "part", "payload")
        .filter($"part" === 0).coalesce(1),
      root, partitionBy = Seq("part"))
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    (1 until 4).foreach { p =>
      IcebergMeta.appendIcebergForeign(spark, root,
        (0 until 64).map(i => (i.toLong, i / 16, s"p$i"))
          .toDF("k", "part", "payload")
          .filter($"part" === p).coalesce(1))
    }
    val all = IcebergMeta.plannedDataManifests(spark, root, None)
    assert(all.size >= 4, s"fixture must be multi-manifest: ${all.size}")
    val kept = IcebergMeta.plannedDataManifests(spark, root,
      Some("part = 2"))
    assert(kept.size < all.size,
      s"summaries must skip manifests: ${kept.size} of ${all.size}")
    assert(kept.size == 1, s"exactly the part=2 manifest: $kept")
    // range predicates prune too
    assert(IcebergMeta.plannedDataManifests(spark, root,
      Some("part >= 3")).size == 1)
    // results hash-unchanged vs the unpruned read
    val pruned = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("part = 2"))
      .select($"k").as[Long].collect().sorted.toSeq
    val full = IcebergMeta.readIceberg(spark, root)
      .filter($"part" === 2)
      .select($"k").as[Long].collect().sorted.toSeq
    assert(pruned == full && pruned.size == 16, s"${pruned.size}")
    // a column with NO summary information keeps every manifest
    assert(IcebergMeta.plannedDataManifests(spark, root,
      Some("payload = 'p7'")).size == all.size)
  }

  test("summary pruning is conservative: old lists without summaries open everything") {
    import spark.implicits._
    val root = freshRoot("mlnosum")
    LT.create((0 until 8).map(i => (i.toLong, i % 2)).toDF("k", "part")
      .coalesce(1), root, partitionBy = Seq("part"))
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    IcebergMeta.appendIcebergForeign(spark, root,
      (8 until 16).map(i => (i.toLong, i % 2)).toDF("k", "part")
        .coalesce(1))
    // STRIP the partitions field from every manifest-list entry —
    // the fixture module's rewriter (one body, no test-side copy)
    operators.Lakehouse.stripManifestListSummaries(root)
    val all = IcebergMeta.plannedDataManifests(spark, root, None)
    assert(IcebergMeta.plannedDataManifests(spark, root,
      Some("part = 0")).size == all.size,
      "summary-less lists must keep every manifest")
    // and the read still serves exact rows
    assert(IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("part = 0")).count() == 8)
  }

  // ---- 3. branch writes + fast-forward (write-audit-publish) ----------------

  test("WAP: branch appends stay invisible to main until FAST FORWARD") {
    import spark.implicits._
    val root = freshRoot("wap")
    LT.create((0 until 8).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    val head = IcebergMeta.snapshots(root).maxBy(_.seq).id
    IcebergMeta.createRefForeign(root, "staging", head, "branch")
    // two staged appends chain on the BRANCH (second parents on first)
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((100L, "a")).toDF("k", "s").coalesce(1),
      branch = Some("staging"))
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((101L, "b")).toDF("k", "s").coalesce(1),
      branch = Some("staging"))
    // the audit window: main unchanged, branch serves the staged rows
    assert(IcebergMeta.readIceberg(spark, root).count() == 8,
      "main must not see staged rows")
    val brHead = IcebergMeta.refSnapshotId(root, "staging").get
    assert(IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(brHead)).count() == 10,
      "the branch head must serve both staged appends")
    val parentOfHead = IcebergMeta.snapshots(root)
      .find(_.id == brHead).get.parent
    assert(IcebergMeta.snapshots(root).find(_.id == parentOfHead)
      .exists(_.parent == head),
      "staged commits must chain on the branch, not on main")
    // PUBLISH: one metadata-only commit; main now serves both eras
    val published = IcebergMeta.fastForwardForeign(root, "staging")
    assert(published == brHead)
    assert(IcebergMeta.readIceberg(spark, root).count() == 10)
    // idempotent re-publish is a no-op
    assert(IcebergMeta.fastForwardForeign(root, "staging") == brHead)
  }

  test("WAP refusals: diverged main, tag appends, unknown branch") {
    import spark.implicits._
    val root = freshRoot("wapref")
    LT.create(Seq((1L, "a")).toDF("k", "s").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    val head = IcebergMeta.snapshots(root).maxBy(_.seq).id
    IcebergMeta.createRefForeign(root, "stage", head, "branch")
    IcebergMeta.createRefForeign(root, "pin", head, "tag")
    // 'main' is the managed pointer: the branch arm would half-commit
    val exMain = intercept[IllegalArgumentException] {
      IcebergMeta.appendIcebergForeign(spark, root,
        Seq((2L, "b")).toDF("k", "s").coalesce(1), branch = Some("main"))
    }
    assert(exMain.getMessage.contains("plain INSERT"), exMain.getMessage)
    // a tag is immutable
    val exTag = intercept[IllegalArgumentException] {
      IcebergMeta.appendIcebergForeign(spark, root,
        Seq((2L, "b")).toDF("k", "s").coalesce(1), branch = Some("pin"))
    }
    assert(exTag.getMessage.contains("tag"), exTag.getMessage)
    // an unknown branch refuses
    val exNone = intercept[IllegalArgumentException] {
      IcebergMeta.appendIcebergForeign(spark, root,
        Seq((2L, "b")).toDF("k", "s").coalesce(1), branch = Some("nope"))
    }
    assert(exNone.getMessage.contains("no ref"), exNone.getMessage)
    // stage on the branch, then MOVE MAIN: fast-forward must refuse
    // (publishing would drop the main-only commit — cherry-pick
    // territory, deliberately out of scope)
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((3L, "c")).toDF("k", "s").coalesce(1), branch = Some("stage"))
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((4L, "d")).toDF("k", "s").coalesce(1))
    val exDiv = intercept[IllegalArgumentException] {
      IcebergMeta.fastForwardForeign(root, "stage")
    }
    assert(exDiv.getMessage.contains("not an ancestor"), exDiv.getMessage)
    // main's own state is intact
    assert(IcebergMeta.readIceberg(spark, root).count() == 2)
    // fast-forwarding a TAG refuses
    val exFfTag = intercept[IllegalArgumentException] {
      IcebergMeta.fastForwardForeign(root, "pin")
    }
    assert(exFfTag.getMessage.contains("branches only"), exFfTag.getMessage)
  }

  test("WAP SQL faces: branch INSERT + FAST FORWARD by quoted path") {
    import spark.implicits._
    val root = freshRoot("wapsql")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    val head = IcebergMeta.snapshots(root).maxBy(_.seq).id
    val p = root.replace("'", "''")
    spark.sql(s"ALTER TABLE iceberg_export('$p') CREATE BRANCH wap " +
      s"AS OF SNAPSHOT $head")
    spark.sql(s"INSERT INTO iceberg_export('$p', 'wap') " +
      "SELECT CAST(9 AS BIGINT) AS k, 'z' AS s")
    assert(IcebergMeta.readIceberg(spark, root).count() == 2,
      "SQL-staged rows must stay off main")
    spark.sql(s"ALTER TABLE iceberg_export('$p') FAST FORWARD main TO wap")
    assert(IcebergMeta.readIceberg(spark, root).count() == 3)
    // the delta face has no branches: the branch argument refuses
    val exDelta = intercept[Exception] {
      spark.sql(s"INSERT INTO delta_export('$p', 'wap') SELECT 1 AS k")
    }
    assert(exDelta.getMessage.contains("no branch argument"),
      exDelta.getMessage)
    // expiry keeps branch-reachable snapshots: stage again, expire,
    // the staged head must survive (refs pin their ancestry)
    spark.sql(s"INSERT INTO iceberg_export('$p', 'wap') " +
      "SELECT CAST(10 AS BIGINT) AS k, 'y' AS s")
    IcebergMeta.expireSnapshotsForeign(root, retainLast = 1)
    val staged = IcebergMeta.refSnapshotId(root, "wap").get
    assert(IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(staged)).count() == 4,
      "expiry must keep the branch-pinned staged snapshot readable")
  }

  test("partition-scoped DELETE manifests prune by summary; global ones always load") {
    import spark.implicits._
    val root = freshRoot("mldelprune")
    LT.create((0 until 16).map(i => (i.toLong, i % 2)).toDF("k", "part")
      .repartition(col("part")), root, partitionBy = Seq("part"))
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    // MOR-delete one part-0 row: the engine's own delete manifest is
    // GLOBAL (unpartitioned spec, no summaries) — always loads
    IcebergMeta.deleteIcebergForeign(spark, root, "k = 2")
    assert(IcebergMeta.plannedDataManifests(spark, root,
      Some("part = 1"), content = 1).size == 1,
      "a global delete manifest must survive any predicate")
    // doctor the list entry into the shape a PARTITION-SCOPED foreign
    // delete writer produces: spec 0 (identity part) + a summary
    // covering part ∈ [0, 0]
    val md = Paths.get(root, "metadata")
    val sid = IcebergMeta.snapshots(root).maxBy(_.seq).id
    val lp = md.resolve(s"snap-$sid.avro")
    val in = new org.apache.avro.file.DataFileReader(
      lp.toFile, new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val (schema, recs) = try (in.getSchema, in.iterator().asScala.toSeq)
      finally in.close()
    val arrSchema = schema.getField("partitions").schema().getTypes.get(1)
    val itemSchema = arrSchema.getElementType
    val out = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    val tmp = Files.createTempFile(md, ".doc", ".avro")
    out.create(schema, tmp.toFile)
    recs.foreach { r =>
      if (r.get("content").asInstanceOf[Int] == 1) {
        r.put("partition_spec_id", 0)
        val s = new org.apache.avro.generic.GenericData.Record(itemSchema)
        s.put("contains_null", false)
        val zero = java.nio.ByteBuffer.wrap(Array[Byte](0, 0, 0, 0))
        s.put("lower_bound", zero.duplicate())
        s.put("upper_bound", zero.duplicate())
        val arr = new org.apache.avro.generic.GenericData
          .Array[org.apache.avro.generic.GenericRecord](1, arrSchema)
        arr.add(s)
        r.put("partitions", arr)
      }
      out.append(r)
    }
    out.close()
    Files.move(tmp, lp, StandardCopyOption.REPLACE_EXISTING)
    // planning: the part=1 predicate SKIPS the delete manifest,
    // part=0 keeps it
    assert(IcebergMeta.plannedDataManifests(spark, root,
      Some("part = 1"), content = 1).isEmpty)
    assert(IcebergMeta.plannedDataManifests(spark, root,
      Some("part = 0"), content = 1).size == 1)
    // results: identical either way — the delete's whole scope fails
    // the predicate that pruned it
    assert(IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("part = 1")).count() == 8)
    assert(IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("part = 0")).count() == 7)
    assert(IcebergMeta.readIceberg(spark, root).count() == 15)
  }

  test("foreign 3-field summaries (no contains_nan) read AND carry forward") {
    import spark.implicits._
    val root = freshRoot("ml3field")
    LT.create((0 until 8).map(i => (i.toLong, i % 2)).toDF("k", "part")
      .coalesce(1), root, partitionBy = Seq("part"))
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    IcebergMeta.appendIcebergForeign(spark, root,
      (8 until 16).map(i => (i.toLong, i % 2)).toDF("k", "part")
        .coalesce(1))
    // rewrite every manifest-list record's summaries under the
    // PRE-Iceberg-0.11 3-field element shape (contains_null/lower/
    // upper, NO contains_nan) — spec-legal foreign output
    val itemOld = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r508","fields":[
        {"name":"contains_null","type":"boolean"},
        {"name":"lower_bound","type":["null","bytes"],"default":null},
        {"name":"upper_bound","type":["null","bytes"],"default":null}
        ]}""".replaceAll("\n\\s*", ""))
    val md = Paths.get(root, "metadata")
    Files.list(md).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("snap-")).foreach { lp =>
        val in = new org.apache.avro.file.DataFileReader(
          lp.toFile, new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        val (oldSchema, recs) =
          try (in.getSchema, in.iterator().asScala.toSeq)
          finally in.close()
        val fields = oldSchema.getFields.asScala.toSeq.map { f =>
          if (f.name != "partitions")
            new org.apache.avro.Schema.Field(f.name, f.schema,
              f.doc, f.defaultVal)
          else new org.apache.avro.Schema.Field("partitions",
            org.apache.avro.Schema.createUnion(
              org.apache.avro.Schema.create(
                org.apache.avro.Schema.Type.NULL),
              org.apache.avro.Schema.createArray(itemOld)),
            null, org.apache.avro.JsonProperties.NULL_VALUE)
        }
        val ns = org.apache.avro.Schema.createRecord(
          oldSchema.getName, oldSchema.getDoc,
          oldSchema.getNamespace, false, fields.asJava)
        val out = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](ns))
        val tmp = Files.createTempFile(md, ".old", ".avro")
        out.create(ns, tmp.toFile)
        recs.foreach { r =>
          val nr = new org.apache.avro.generic.GenericData.Record(ns)
          ns.getFields.asScala.foreach { f =>
            if (f.name != "partitions") nr.put(f.name, r.get(f.name))
            else nr.put("partitions", r.get("partitions") match {
              case l: java.util.List[_] =>
                val arr = new org.apache.avro.generic.GenericData
                  .Array[org.apache.avro.generic.GenericRecord](
                    l.size(), ns.getField("partitions").schema()
                      .getTypes.get(1))
                l.asScala.foreach { e0 =>
                  val e = e0.asInstanceOf[
                    org.apache.avro.generic.GenericRecord]
                  val ne = new org.apache.avro.generic.GenericData
                    .Record(itemOld)
                  ne.put("contains_null", e.get("contains_null"))
                  ne.put("lower_bound", e.get("lower_bound"))
                  ne.put("upper_bound", e.get("upper_bound"))
                  arr.add(ne)
                }
                arr
              case _ => null
            })
          }
          out.append(nr)
        }
        out.close()
        Files.move(tmp, lp, StandardCopyOption.REPLACE_EXISTING)
      }
    // (a) the PRUNED read neither crashes nor loses rows — the
    // 3-field bounds still prune (identity int field, nan-irrelevant)
    assert(IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("part = 0")).count() == 8)
    assert(IcebergMeta.plannedDataManifests(spark, root,
      Some("part = 0")).nonEmpty)
    // (b) a carry-forward commit re-shapes the foreign elements onto
    // the current summary schema instead of dying in avro
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((99L, 0)).toDF("k", "part").coalesce(1))
    assert(IcebergMeta.readIceberg(spark, root).count() == 17)
  }

  // ---- inspection TVFs -------------------------------------------------------

  test("inspection TVFs: snapshots, pinned files, and history agree with the chain") {
    import spark.implicits._
    val root = freshRoot("inspect")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    val sid1 = IcebergMeta.snapshots(root).maxBy(_.seq).id
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((3L, "c")).toDF("k", "s").coalesce(1))
    val p = root.replace("'", "''")
    // snapshots: one row per snapshot, parent chain intact
    val snaps = spark.sql(
      s"SELECT snapshot_id, parent_id, operation FROM " +
        s"iceberg_snapshots('$p') ORDER BY sequence_number")
      .collect()
    assert(snaps.length == 2)
    assert(snaps(0).isNullAt(1), "first snapshot has no parent")
    assert(snaps(1).getLong(1) == snaps(0).getLong(0))
    // files: current sees both files; PINNED to sid1 sees one
    assert(spark.sql(s"SELECT * FROM iceberg_files('$p')").count() == 2)
    val pinned = spark.sql(
      s"SELECT CAST(sum(record_count) AS BIGINT) AS r FROM " +
        s"iceberg_files('$p', $sid1)").head().getLong(0)
    assert(pinned == 2L, s"pinned census must be the first era: $pinned")
    // delta history: the foreign iceberg append is invisible to the
    // DELTA log (one create version, 1 add, 0 removes)
    val hist = spark.sql(
      s"SELECT version, n_adds, n_removes FROM delta_history('$p') " +
        "ORDER BY version").collect()
    assert(hist.length == 1 && hist(0).getLong(1) == 1L &&
      hist(0).getLong(2) == 0L, hist.mkString(","))
  }

  // ---- 4. reader-feature validation ------------------------------------------

  private def doctorProtocol(root: String, protocolJson: String): Unit = {
    val lf0 = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    val doctored = Files.readString(lf0).replaceAll(
      """"protocol":\{[^}]*\}""", s""""protocol":$protocolJson""")
    assert(doctored.contains(protocolJson.take(30)), "doctor must apply")
    Files.writeString(lf0, doctored)
  }

  test("an unimplemented reader feature refuses on read (table-features spec)") {
    import spark.implicits._
    val root = freshRoot("rfeat")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    doctorProtocol(root,
      """{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["futureMagic"],"writerFeatures":["appendOnly"]}""")
    val ex = intercept[IllegalArgumentException] {
      LT.readDeltaExport(spark, root).count()
    }
    assert(ex.getMessage.contains("futureMagic"), ex.getMessage)
    // the whole implemented set is accepted
    doctorProtocol(root,
      """{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","columnMapping","timestampNtz","v2Checkpoint"],"writerFeatures":["deletionVectors","v2Checkpoint"]}""")
    assert(LT.readDeltaExport(spark, root).count() == 2)
  }

  // ---- 3. ADVICE closures -----------------------------------------------------

  test("unparseable deletedFileRetentionDuration refuses at SET and maintenance time") {
    import spark.implicits._
    val root = freshRoot("retparse")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    // declaration-time refusal (reference Delta rejects calendar units)
    val exSet = intercept[IllegalArgumentException] {
      LT.setPropertiesDeltaForeign(spark, root,
        Map("delta.deletedFileRetentionDuration" -> "interval 1 month"))
    }
    assert(exSet.getMessage.contains("month"), exSet.getMessage)
    // a chain that ALREADY declares one (foreign writer) refuses at
    // the maintenance sites instead of silently substituting 168 h
    val lf0 = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    Files.writeString(lf0, Files.readString(lf0).replace(
      """"configuration":{}""",
      """"configuration":{"delta.deletedFileRetentionDuration":"interval 1 month"}"""))
    val exVac = intercept[IllegalArgumentException] {
      LT.vacuumDeltaForeign(spark, root)
    }
    assert(exVac.getMessage.contains("cannot parse"), exVac.getMessage)
    val exCkpt = intercept[IllegalArgumentException] {
      LT.checkpointDeltaForeign(spark, root)
    }
    assert(exCkpt.getMessage.contains("cannot parse"), exCkpt.getMessage)
    // an explicit RETAIN still works: the operator's own horizon does
    // not consult the broken property
    assert(LT.vacuumDeltaForeign(spark, root, retainHours = 168.0,
      explicitRetain = true).isEmpty)
  }

  test("an id-less name-mapping entry neither NPEs reads nor appends") {
    import spark.implicits._
    val root = freshRoot("nmidless")
    LT.create((0 until 4).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    // doctor the mapping: one spec-legal entry WITHOUT field-id (the
    // NameMappingParser shape for unassigned columns)
    val hint = Paths.get(root, "metadata", "version-hint.text")
    val mv = Files.readString(hint).trim.toLong
    val mdPath = Paths.get(root, "metadata", s"v$mv.metadata.json")
    val md = om.readTree(Files.readString(mdPath))
    val props = md.get("properties")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val mapping = om.readTree(
      props.get("schema.name-mapping.default").asText())
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    val idless = om.createObjectNode()
    idless.putArray("names").add("legacy_alias")
    mapping.add(idless)
    props.put("schema.name-mapping.default", om.writeValueAsString(mapping))
    Files.writeString(mdPath, om.writeValueAsString(md))
    // read resolves (the id-less entry maps to nothing), append
    // extends the mapping without NPE
    assert(IcebergMeta.readIceberg(spark, root).count() == 4)
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((9L, "v9")).toDF("k", "s").coalesce(1))
    assert(IcebergMeta.readIceberg(spark, root).count() == 5)
  }

  test("case-variant USER property keys are distinct; delta.* keys are not") {
    import spark.implicits._
    val root = freshRoot("propcase")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    val p = root.replace("'", "''")
    // user keys compare verbatim: this is two DISTINCT properties
    spark.sql(s"ALTER TABLE delta_export('$p') SET TBLPROPERTIES " +
      "('Team.Owner'='a','team.owner'='b')")
    val v = LT.deltaLogVersions(root).max
    val commit = Files.readString(
      Paths.get(root, "_delta_log", f"$v%020d.json"))
    assert(commit.contains("\"Team.Owner\":\"a\"") &&
      commit.contains("\"team.owner\":\"b\""), commit)
    // delta.* keys canonicalize case-insensitively: a case-variant
    // pair IS a duplicate
    val ex = intercept[Exception] {
      spark.sql(s"ALTER TABLE delta_export('$p') SET TBLPROPERTIES " +
        "('delta.appendOnly'='true','delta.APPENDONLY'='true')")
    }
    assert(ex.getMessage.toLowerCase.contains("duplicate"), ex.getMessage)
  }
}
