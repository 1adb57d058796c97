package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergMeta, LakehouseTable => LT}

/** Round-14 pins — the round-13 verdict's ranked list:
  *
  *  1. Delta foreign ZORDER OPTIMIZE: the whole live population
  *     rewrites z-clustered in ONE dataChange=false commit; a 2-column
  *     range predicate plans strictly fewer files than before, rows
  *     are verbatim, and the bin-pack path's semantics are untouched.
  *  2. Iceberg rewrite-manifests: the manifest population of a
  *     many-append chain drops without touching any data file; time
  *     travel to the parent is intact; the keyed changelog over the
  *     replace snapshot derives ZERO rows; a re-run is a no-op.
  *  3. Name-mapping writes: appends to an id-less foreign chain carry
  *     REAL parquet field ids in their footers, and ADD COLUMNS
  *     extends schema.name-mapping.default in the same commit — every
  *     era of the mixed chain resolves.
  *  4. setTransaction on the foreign Delta face: txn-stamped appends
  *     are idempotent per appId, the watermark rides the checkpoint
  *     parquet through log cleanup (checkpoints no longer refuse txn
  *     tails), and the streaming sink built on it is exactly-once
  *     across a restart (StreamingSpec holds the stream-level twin).
  *  5. ADVICE closures: restore refuses removing files from an
  *     append-only table; checkpoint tombstone expiry and vacuum's
  *     default horizon honor delta.deletedFileRetentionDuration; the
  *     checkpoint persists remove deletionVector descriptors; MERGE's
  *     WHEN MATCHED AND cond THEN DELETE only deletes MATCHED rows
  *     (unmatched cond-true rows INSERT); the MERGE USING body parses
  *     by balanced-paren scan (a nested join's ON cannot mis-split).
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/r14_$name"
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

  // ---- 1. Delta foreign ZORDER OPTIMIZE -----------------------------------

  test("delta foreign ZORDER: fewer planned files, verbatim rows, dataChange=false") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fz")
    // 512 rows over two independent keys, randomly laid out in 8 files:
    // every file spans the full range of BOTH — data skipping has
    // nothing to prune on
    val df = (0 until 512).map(i => (i.toLong, ((i * 37) % 512).toLong,
      s"p$i")).toDF("a", "b", "payload")
    LT.create(df.repartition(8), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    val pred = "a <= 127 AND b <= 127"
    val pre = LT.readDeltaExport(spark, root, pruneWhere = Some(pred))
    val prePlanned = pre.inputFiles.length
    assert(prePlanned == 8, s"random layout must defeat skipping: $prePlanned")
    val v = LT.optimizeDeltaForeign(spark, root,
      targetBytes = 4L * 1024, zorderBy = Seq("a", "b"))
    // the commit is pure layout churn: every remove and add carries
    // dataChange=false, so streams and CDF readers skip it
    val (adds, removes) = LT.deltaActionsDetailedIn(root, v)
    assert(removes.size == 8 && adds.size >= 2, s"${adds.size}/${removes.size}")
    assert((adds ++ removes).forall(!_.dataChange), "must be dataChange=false")
    // planned files DROP under the same predicate...
    val post = LT.readDeltaExport(spark, root, pruneWhere = Some(pred))
    assert(post.inputFiles.length < prePlanned,
      s"zorder must shrink the planned set: ${post.inputFiles.length}")
    // ...and the answers are identical (rows verbatim)
    assert(post.agg(org.apache.spark.sql.functions.sum(col("a") + col("b")))
      .head().getLong(0) ==
      pre.agg(org.apache.spark.sql.functions.sum(col("a") + col("b")))
        .head().getLong(0))
    assert(LT.readDeltaExport(spark, root).count() == 512)
    // single-column form clusters too (range sort, no curve)
    val v2 = LT.optimizeDeltaForeign(spark, root,
      targetBytes = 4L * 1024, zorderBy = Seq("a"))
    assert(v2 == v + 1)
    val aOnly = LT.readDeltaExport(spark, root,
      pruneWhere = Some("a <= 63"))
    assert(aOnly.inputFiles.length < LT.readDeltaExport(spark, root)
      .inputFiles.length)
    assert(aOnly.count() == 64)
    // refusals: unknown column; partition column
    val exCol = intercept[IllegalArgumentException] {
      LT.optimizeDeltaForeign(spark, root, zorderBy = Seq("nope", "a"))
    }
    assert(exCol.getMessage.contains("not in the table schema"))
    val proot = freshRoot("fzp")
    LT.create(df.repartition(4), proot, partitionBy = Seq("payload"))
    LT.exportDeltaLog(spark, proot)
    wipeManifest(proot)
    val exPart = intercept[IllegalArgumentException] {
      LT.optimizeDeltaForeign(spark, proot, zorderBy = Seq("payload", "a"))
    }
    assert(exPart.getMessage.contains("partition column"))
  }

  test("SQL face: OPTIMIZE delta_export(...) ZORDER BY clusters the log") {
    import spark.implicits._
    val root = freshRoot("fzsql")
    val df = (0 until 256).map(i => (i.toLong, ((i * 53) % 256).toLong))
      .toDF("x", "y")
    LT.create(df.repartition(6), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    spark.sql(s"OPTIMIZE delta_export('$root') ZORDER BY (x, y)")
    val post = LT.readDeltaExport(spark, root,
      pruneWhere = Some("x <= 63 AND y <= 63"))
    assert(post.inputFiles.length < 6)
    assert(LT.readDeltaExport(spark, root).count() == 256)
    // ZORDER BY on the Iceberg face refuses loudly
    val ex = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE iceberg_export('$root') ZORDER BY (x)")
    }
    assert(ex.getMessage.contains("no ZORDER BY"))
  }

  // ---- 2. Iceberg rewrite-manifests ----------------------------------------

  test("iceberg rewrite-manifests: manifests drop, data files untouched, changelog zero") {
    import spark.implicits._
    val root = freshRoot("rwm")
    val mk = (r: Int) => (0 until 40).filter(_ % 5 == r)
      .map(i => (i.toLong, s"s$i")).toDF("k", "s")
    LT.create(mk(0).coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    (1 to 4).foreach { r =>
      IcebergMeta.appendIcebergForeign(spark, root, mk(r).coalesce(1)); ()
    }
    val parent = IcebergMeta.snapshots(root).maxBy(_.seq)
    val preManifests = IcebergMeta.manifestPaths(root)
    assert(preManifests.size == 5, s"five appends: ${preManifests.size}")
    val preFiles = IcebergMeta.readIceberg(spark, root).inputFiles.toSet
    val sid = IcebergMeta.rewriteManifestsForeign(root)
    assert(sid != parent.id, "must commit a replace snapshot")
    // ONE consolidated manifest; the SAME data files plan
    assert(IcebergMeta.manifestPaths(root).size == 1)
    val post = IcebergMeta.readIceberg(spark, root)
    assert(post.inputFiles.toSet == preFiles, "zero data-file IO")
    assert(post.select($"k").as[Long].collect().sorted.toSeq ==
      (0L until 40L))
    // time travel to the parent is intact (its list is untouched)
    assert(IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(parent.id)).count() == 40)
    // the keyed changelog over the replace snapshot derives ZERO rows
    val newSeq = IcebergMeta.snapshots(root).maxBy(_.seq).seq
    assert(IcebergMeta.icebergChangelog(spark, root,
      parent.seq, newSeq, Seq("k")).count() == 0)
    // pruning still works through the consolidated manifest (bounds
    // carried verbatim), and a re-run is a no-op (no new snapshot)
    assert(IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("k <= 7")).count() == 8)
    assert(IcebergMeta.rewriteManifestsForeign(root) == sid)
    // SQL face
    spark.sql(s"REWRITE MANIFESTS iceberg_export('$root')")
    assert(IcebergMeta.manifestPaths(root).size == 1)
  }

  test("iceberg rewrite-manifests consolidates around a delete manifest") {
    import spark.implicits._
    val root = freshRoot("rwmd")
    LT.create((0 until 20).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    IcebergMeta.appendIcebergForeign(spark, root,
      (20 until 40).map(i => (i.toLong, s"v$i")).toDF("k", "s").coalesce(1))
    // a MOR delete adds a content=1 manifest that must carry VERBATIM
    IcebergMeta.deleteIcebergForeign(spark, root, "k = 3 OR k = 25")
    val pre = IcebergMeta.manifestPaths(root).size
    assert(pre >= 3, s"two data + one delete manifest: $pre")
    IcebergMeta.rewriteManifestsForeign(root)
    val post = IcebergMeta.manifestPaths(root).size
    assert(post == 2, s"one consolidated data + the delete manifest: $post")
    assert(IcebergMeta.readIceberg(spark, root)
      .select($"k").as[Long].collect().sorted.toSeq ==
      (0L until 40L).filterNot(k => k == 3L || k == 25L))
  }

  // ---- 3. Name-mapping writes ----------------------------------------------

  test("id-less foreign chain: appends carry footer field ids; ADD COLUMNS extends the mapping") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("nm")
    LT.create((0 until 10).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    // the exporter's chain IS the id-less shape: data files carry no
    // parquet field ids and the metadata declares a name mapping
    def curMeta(): String = {
      val n = Files.readString(
        Paths.get(root, "metadata", "version-hint.text")).trim.toLong
      Files.readString(Paths.get(root, "metadata", s"v$n.metadata.json"))
    }
    assert(curMeta().contains("schema.name-mapping.default"))
    val preFiles = IcebergMeta.readIceberg(spark, root).inputFiles.toSet
    def footerIds(file: String): Seq[Integer] = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getFileMetaData.getSchema.getFields.asScala.toSeq
        .map(_.getId).map(id => if (id == null) null else
          Integer.valueOf(id.intValue()))
      finally r.close()
    }
    preFiles.foreach(f => assert(footerIds(f).forall(_ == null),
      s"exporter files must be id-less: $f"))
    // ADD COLUMNS extends the mapping in the SAME commit
    IcebergMeta.addColumnsIcebergForeign(root, "note string")
    val mapping = om.readTree(om.readTree(curMeta()).get("properties")
      .get("schema.name-mapping.default").asText())
    val mapped = mapping.elements().asScala.flatMap(e =>
      e.get("names").elements().asScala.map(_.asText())).toSet
    assert(mapped.contains("note"),
      s"mapping must cover the added column: $mapped")
    // the appended era carries REAL field ids in its footers
    IcebergMeta.appendIcebergForeign(spark, root,
      (10 until 20).map(i => (i.toLong, s"v$i", "M"))
        .toDF("k", "s", "note").coalesce(1))
    val newFiles = IcebergMeta.readIceberg(spark, root)
      .inputFiles.toSet -- preFiles
    assert(newFiles.nonEmpty)
    newFiles.foreach { f =>
      val ids = footerIds(f)
      assert(ids.forall(_ != null), s"append must stamp field ids: $f")
    }
    // the mixed chain reads exactly: id-less era null-fills, id era
    // serves the new column
    val rows = IcebergMeta.readIceberg(spark, root)
      .select($"k", org.apache.spark.sql.functions
        .coalesce(col("note"), org.apache.spark.sql.functions.lit("-"))
        .as("note"))
      .as[(Long, String)].collect().toMap
    assert(rows.size == 20)
    assert((0 until 10).forall(i => rows(i.toLong) == "-"))
    assert((10 until 20).forall(i => rows(i.toLong) == "M"))
  }

  // ---- 4. Foreign setTransaction + checkpoint carry -------------------------

  test("foreign delta txn appends are idempotent and survive checkpoint + cleanup") {
    import spark.implicits._
    val root = freshRoot("txn")
    LT.create(Seq((1L, "a")).toDF("k", "s").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    val v1 = LT.appendDeltaForeign(spark, root,
      Seq((2L, "b")).toDF("k", "s").coalesce(1),
      txn = Some(1L), txnApp = "sink")
    // replaying batch 1 is a detected no-op: same version, same rows
    assert(LT.appendDeltaForeign(spark, root,
      Seq((2L, "b")).toDF("k", "s").coalesce(1),
      txn = Some(1L), txnApp = "sink") == v1)
    assert(LT.readDeltaExport(spark, root).count() == 2)
    // a DIFFERENT app id is not deduped against this one
    LT.appendDeltaForeign(spark, root,
      Seq((3L, "c")).toDF("k", "s").coalesce(1),
      txn = Some(1L), txnApp = "other")
    assert(LT.readDeltaExport(spark, root).count() == 3)
    assert(LT.lastTxnDeltaForeign(spark, root, "sink").contains(1L))
    // checkpoint + cleanup: the watermark must ride the checkpoint
    // parquet (the JSON tail that carried it is deleted)
    LT.checkpointDeltaForeign(spark, root)
    assert(LT.cleanupDeltaLogForeign(root) > 0)
    assert(LT.lastTxnDeltaForeign(spark, root, "sink").contains(1L))
    assert(LT.lastTxnDeltaForeign(spark, root, "other").contains(1L))
    // the replay guard still holds post-cleanup; a NEW batch commits
    assert(LT.appendDeltaForeign(spark, root,
      Seq((9L, "x")).toDF("k", "s").coalesce(1),
      txn = Some(1L), txnApp = "sink") ==
      LT.deltaLogVersions(root).max)
    assert(LT.readDeltaExport(spark, root).count() == 3)
    LT.appendDeltaForeign(spark, root,
      Seq((4L, "d")).toDF("k", "s").coalesce(1),
      txn = Some(2L), txnApp = "sink")
    assert(LT.readDeltaExport(spark, root).count() == 4)
    assert(LT.lastTxnDeltaForeign(spark, root, "sink").contains(2L))
  }

  // ---- Foreign TBLPROPERTIES + Iceberg refs ---------------------------------

  test("foreign delta SET TBLPROPERTIES: obligations commit with the property") {
    import spark.implicits._
    val root = freshRoot("props")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    // enabling CDF on a legacy protocol bumps minWriterVersion to 4 in
    // the SAME commit — without it a minWriter-2 foreign writer could
    // legally commit removes with no cdc
    val v = LT.setPropertiesDeltaForeign(spark, root,
      Map("delta.enableChangeDataFeed" -> "true"))
    val commit = Files.readString(
      Paths.get(root, "_delta_log", f"$v%020d.json"))
    assert(commit.contains("\"minWriterVersion\":4"), commit)
    assert(commit.contains("delta.enableChangeDataFeed"))
    // the delete AFTER enablement is obliged to record change data
    val delVer = LT.deleteDeltaForeign(spark, root, "k = 2")
    val ch = LT.readDeltaExportChanges(spark, root, delVer, delVer)
    assert(ch.select($"_change_type", $"k").as[(String, Long)]
      .collect().toSeq == Seq(("delete", 2L)))
    // appendOnly=true: appends keep working, removes refuse
    LT.setPropertiesDeltaForeign(spark, root,
      Map("delta.appendOnly" -> "true"))
    LT.appendDeltaForeign(spark, root,
      Seq((3L, "c")).toDF("k", "s").coalesce(1))
    val exDel = intercept[IllegalArgumentException] {
      LT.deleteDeltaForeign(spark, root, "k = 1")
    }
    assert(exDel.getMessage.contains("append-only"))
    // UNSET lifts it
    LT.setPropertiesDeltaForeign(spark, root, Map.empty,
      unset = Seq("delta.appendOnly"))
    LT.deleteDeltaForeign(spark, root, "k = 3")
    // unknown delta.* keys refuse; user keys pass; no-op no-commits
    val exKey = intercept[IllegalArgumentException] {
      LT.setPropertiesDeltaForeign(spark, root,
        Map("delta.columnMapping.mode" -> "name"))
    }
    assert(exKey.getMessage.contains("obligations"), exKey.getMessage)
    val v2 = LT.setPropertiesDeltaForeign(spark, root,
      Map("team.owner" -> "data-eng"))
    assert(LT.setPropertiesDeltaForeign(spark, root,
      Map("team.owner" -> "data-eng")) == v2, "no-op must not commit")
    // review pins: a case-variant delta.* SET canonicalizes key AND
    // boolean value — the enforcement sites read the exact canonical
    // forms, so 'delta.APPENDONLY'='TRUE' must land as
    // 'delta.appendOnly'='true' and actually ENFORCE
    val v3 = LT.setPropertiesDeltaForeign(spark, root,
      Map("delta.APPENDONLY" -> "TRUE"))
    val commit3 = Files.readString(
      Paths.get(root, "_delta_log", f"$v3%020d.json"))
    assert(commit3.contains(""""delta.appendOnly":"true"""), commit3)
    val exDel2 = intercept[IllegalArgumentException] {
      LT.deleteDeltaForeign(spark, root, "k = 1")
    }
    assert(exDel2.getMessage.contains("append-only"))
    // UNSET of a delta.* key is case-insensitive (one canonical key);
    // UNSET of a USER key is case-sensitive (Delta treats case-distinct
    // user keys as different properties — a near-miss must NOT delete)
    LT.setPropertiesDeltaForeign(spark, root, Map.empty,
      unset = Seq("delta.appendonly"))
    LT.setPropertiesDeltaForeign(spark, root,
      Map.empty, unset = Seq("TEAM.OWNER"))
    val lastMeta = Files.readString(Paths.get(root, "_delta_log",
      f"${LT.deltaLogVersions(root).max}%020d.json"))
    assert(lastMeta.contains("team.owner"),
      "a case-variant UNSET must not delete a case-distinct user key")
  }

  test("iceberg foreign properties + refs: tag pins a snapshot through expiry") {
    import spark.implicits._
    val root = freshRoot("refs")
    LT.create(Seq((1L, "a")).toDF("k", "s").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    // properties round-trip; managed keys refuse
    IcebergMeta.setPropertiesIcebergForeign(root,
      Map("commit.retry.num-retries" -> "7"))
    val exManaged = intercept[IllegalArgumentException] {
      IcebergMeta.setPropertiesIcebergForeign(root,
        Map("schema.name-mapping.default" -> "[]"))
    }
    assert(exManaged.getMessage.contains("maintained"), exManaged.getMessage)
    IcebergMeta.setPropertiesIcebergForeign(root, Map.empty,
      unset = Seq("commit.retry.num-retries"))
    // refs: tag the first snapshot, append, expire — the tag target
    // survives and time travel by name serves the original state
    val first = IcebergMeta.snapshots(root).minBy(_.seq).id
    IcebergMeta.createRefForeign(root, "audit", first, "tag")
    val exDup = intercept[IllegalArgumentException] {
      IcebergMeta.createRefForeign(root, "audit", first, "tag")
    }
    assert(exDup.getMessage.contains("already exists"))
    intercept[IllegalArgumentException] {
      IcebergMeta.createRefForeign(root, "main", first, "branch")
    }
    intercept[IllegalArgumentException] {
      IcebergMeta.createRefForeign(root, "ghost", 12345L, "tag")
    }
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((2L, "b")).toDF("k", "s").coalesce(1))
    IcebergMeta.expireSnapshotsForeign(root, retainLast = 1)
    val sid = IcebergMeta.refSnapshotId(root, "audit")
    assert(sid.contains(first), "expiry must keep the ref target")
    assert(IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(first)).count() == 1)
    assert(IcebergMeta.readIceberg(spark, root).count() == 2)
    // drop: unknown refuses, real one goes, main protected
    intercept[IllegalArgumentException] {
      IcebergMeta.dropRefForeign(root, "nope")
    }
    intercept[IllegalArgumentException] {
      IcebergMeta.dropRefForeign(root, "main")
    }
    IcebergMeta.dropRefForeign(root, "audit")
    assert(IcebergMeta.refSnapshotId(root, "audit").isEmpty)
    // a typed drop refuses a ref of the OTHER kind (Iceberg's own
    // behavior — a mistyped verb must not remove a protected pointer)
    IcebergMeta.createRefForeign(root, "dev", first, "branch")
    val exType = intercept[IllegalArgumentException] {
      IcebergMeta.dropRefForeign(root, "dev", expectType = Some("tag"))
    }
    assert(exType.getMessage.contains("is a branch"), exType.getMessage)
    IcebergMeta.dropRefForeign(root, "dev", expectType = Some("branch"))
  }

  test("SQL faces: SET/UNSET TBLPROPERTIES and CREATE/DROP TAG by quoted path") {
    import spark.implicits._
    val droot = freshRoot("propsql")
    LT.create(Seq((1L, "a")).toDF("k", "s").coalesce(1), droot)
    LT.exportDeltaLog(spark, droot)
    wipeManifest(droot)
    spark.sql(s"ALTER TABLE delta_export('$droot') SET TBLPROPERTIES " +
      "('delta.appendOnly'='true', 'team.owner'='x')")
    val ex = intercept[IllegalArgumentException] {
      spark.sql(s"DELETE FROM delta_export('$droot') WHERE k = 1")
    }
    assert(ex.getMessage.contains("append-only"))
    spark.sql(s"ALTER TABLE delta_export('$droot') UNSET TBLPROPERTIES " +
      "('delta.appendOnly')")
    spark.sql(s"DELETE FROM delta_export('$droot') WHERE k = 1")
    assert(LT.readDeltaExport(spark, droot).count() == 0)

    val iroot = freshRoot("refsql")
    LT.create(Seq((1L, "a")).toDF("k", "s").coalesce(1), iroot)
    IcebergMeta.exportIcebergMeta(spark, iroot)
    wipeManifest(iroot)
    val first = IcebergMeta.snapshots(iroot).minBy(_.seq).id
    spark.sql(s"ALTER TABLE iceberg_export('$iroot') CREATE TAG audit " +
      s"AS OF SNAPSHOT $first")
    assert(IcebergMeta.refSnapshotId(iroot, "audit").contains(first))
    spark.sql(s"ALTER TABLE iceberg_export('$iroot') " +
      "SET TBLPROPERTIES ('write.metadata.compression-codec'='none')")
    // time travel BY TAG NAME through the TVF read — the spec's named
    // time travel, composing CREATE TAG with the quoted second arg
    IcebergMeta.appendIcebergForeign(spark, iroot,
      Seq((2L, "b")).toDF("k", "s").coalesce(1))
    assert(spark.sql(
      s"SELECT count(*) AS n FROM iceberg_export('$iroot', 'audit')")
      .head().getLong(0) == 1, "the tag resolves to the first snapshot")
    assert(spark.sql(
      s"SELECT count(*) AS n FROM iceberg_export('$iroot')")
      .head().getLong(0) == 2)
    spark.sql(s"ALTER TABLE iceberg_export('$iroot') DROP TAG audit")
    assert(IcebergMeta.refSnapshotId(iroot, "audit").isEmpty)
  }

  test("IcebergBucketIndex (codegen) equals the planner's Appendix-B hash") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.sources.{IcebergBucketIndex, IcebergTransforms}
    def bucketed(in: org.apache.spark.sql.Column, n: Int) =
      ColumnBridge.column(IcebergBucketIndex(
        ColumnBridge.expression(in), n))
    // long path: the spec's own vector (34 → hash 2017239379)
    val longs = Seq(Some(34L), Some(0L), Some(-7L), None).toDF("v")
    val got = longs.select(bucketed($"v", 16).as("b"))
      .as[Option[Int]].collect().toSeq
    val want = Seq(Some(34L), Some(0L), Some(-7L), None).map(_.map(v =>
      IcebergTransforms.bucketIndexLong(v, 16)))
    assert(got == want, s"$got vs $want")
    assert(want.head.contains((2017239379 & Int.MaxValue) % 16))
    // string path ("iceberg" → 1210000089), null-preserving
    val strs = Seq(Some("iceberg"), Some(""), None).toDF("s")
    val gotS = strs.select(bucketed($"s", 8).as("b"))
      .as[Option[Int]].collect().toSeq
    assert(gotS == Seq(
      Some((1210000089 & Int.MaxValue) % 8),
      Some(IcebergTransforms.bucketIndexUtf8(
        org.apache.spark.unsafe.types.UTF8String.fromString(""), 8)),
      None))
    // wrong input type refuses at analysis
    val ex = intercept[Exception] {
      Seq(1.5).toDF("d").select(bucketed($"d", 4)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("bigint") ||
      ex.getMessage.contains("iceberg_bucket"), ex.getMessage)
  }

  // ---- 5. ADVICE closures ----------------------------------------------------

  test("restore refuses to remove files from an append-only table") {
    import spark.implicits._
    val root = freshRoot("aoRestore")
    LT.create(Seq((1L, "a")).toDF("k", "s").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    LT.appendDeltaForeign(spark, root,
      Seq((2L, "b")).toDF("k", "s").coalesce(1))
    // doctor appendOnly into the table conf (the Round13 pattern)
    val lf = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    val doctored = Files.readString(lf).replace(
      """"configuration":{}""",
      """"configuration":{"delta.appendOnly":"true"}""")
    assert(doctored.contains("appendOnly"), "doctor must apply")
    Files.writeString(lf, doctored)
    val ex = intercept[IllegalArgumentException] {
      LT.restoreDeltaForeign(spark, root, 0L)
    }
    assert(ex.getMessage.contains("append-only"), ex.getMessage)
  }

  test("delta.deletedFileRetentionDuration parses and gates vacuum's default horizon") {
    assert(LT.deltaIntervalMs("interval 1 week").contains(
      7L * 24 * 3600 * 1000))
    assert(LT.deltaIntervalMs("interval 30 days").contains(
      30L * 24 * 3600 * 1000))
    assert(LT.deltaIntervalMs("interval 1 day 12 hours").contains(
      36L * 3600 * 1000))
    assert(LT.deltaIntervalMs("interval 90 minutes").contains(5400000L))
    // unparseable text must NOT read as zero (a mis-read retention
    // reclaims files readers still resolve): None → caller default
    assert(LT.deltaIntervalMs("interval 1 month").isEmpty)
    assert(LT.deltaIntervalMs("sometimes").isEmpty)

    import spark.implicits._
    val root = freshRoot("retention")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s").repartition(2), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    // declare a LONG retention, then remove a file
    val lf = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    Files.writeString(lf, Files.readString(lf).replace(
      """"configuration":{}""",
      """"configuration":{"delta.deletedFileRetentionDuration":"interval 1000 days"}"""))
    LT.deleteDeltaForeign(spark, root, "k = 2")
    // default vacuum (no explicit RETAIN) honors the table's window:
    // nothing reclaimed even though 0 hours have passed
    assert(LT.vacuumDeltaForeign(spark, root).isEmpty)
    // an EXPLICIT retain overrides (Delta's own unsafe bypass)
    assert(LT.vacuumDeltaForeign(spark, root, retainHours = 0.0,
      explicitRetain = true).nonEmpty)
  }

  test("checkpoint persists remove deletionVector descriptors for vacuum") {
    import spark.implicits._
    val root = freshRoot("ckptdv")
    LT.create((0 until 8).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .coalesce(1), root)
    LT.deleteWhereMor(spark, root, "k = 3") // a DV on the single file
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    // a foreign UPDATE rewrites the DV-bearing file: its remove carries
    // the deletionVector descriptor
    LT.updateDeltaForeign(spark, root, "k = 5", Map("s" -> "'upd'"))
    LT.checkpointDeltaForeign(spark, root)
    val ckpt = Files.list(Paths.get(root, "_delta_log")).iterator().asScala
      .find(_.toString.endsWith(".checkpoint.parquet")).get
    val ck = spark.read.parquet(ckpt.toString)
    val removeType = ck.schema("remove").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(removeType.fieldNames.contains("deletionVector"),
      "checkpoint remove schema must carry the DV descriptor")
    val dvRows = ck.filter(org.apache.spark.sql.functions
      .col("remove.deletionVector").isNotNull).count()
    assert(dvRows >= 1, "the rewritten DV-bearing file's tombstone " +
      "must persist its descriptor")
  }

  test("MERGE deletes only MATCHED rows; unmatched cond-true rows INSERT") {
    import spark.implicits._
    // native face
    val root = freshRoot("mdel")
    LT.create(Seq((1L, "keep"), (2L, "gone")).toDF("k", "s").coalesce(1),
      root)
    graft.sql.GraftCatalog.register(spark, "r14_merge_t", root, Nil)
    spark.sql(
      """MERGE INTO r14_merge_t AS t USING (
           SELECT 2L AS k, 'x' AS s, true AS del UNION ALL
           SELECT 3L AS k, 'new' AS s, true AS del UNION ALL
           SELECT 4L AS k, 'upd' AS s, false AS del
         ) AS src ON t.k = src.k
         WHEN MATCHED AND src.del THEN DELETE
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val out = LT.read(spark, root).select($"k", $"s")
      .as[(Long, String)].collect().toMap
    // k=2 matched + del → deleted; k=3 UNMATCHED + del=true → INSERTED
    // (the Spark/Delta semantics the old source-only filter dropped);
    // k=4 unmatched → inserted
    assert(out == Map(1L -> "keep", 3L -> "new", 4L -> "upd"), out.toString)

    // foreign Delta face
    val froot = freshRoot("mdelf")
    LT.create(Seq((1L, "keep"), (2L, "gone")).toDF("k", "s").coalesce(1),
      froot)
    LT.exportDeltaLog(spark, froot)
    wipeManifest(froot)
    spark.sql(
      s"""MERGE INTO delta_export('$froot') AS t USING (
           SELECT 2L AS k, 'x' AS s UNION ALL
           SELECT 3L AS k, 'x' AS s
         ) AS src ON t.k = src.k
         WHEN MATCHED AND src.s = 'x' THEN DELETE
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val fout = LT.readDeltaExport(spark, froot).select($"k", $"s")
      .as[(Long, String)].collect().toMap
    // k=2 matched + cond → deleted; k=3 UNMATCHED + cond-true → INSERTED
    assert(fout == Map(1L -> "keep", 3L -> "x"), fout.toString)
  }

  test("review pins: interval saturation, mapping merge-by-id, comment-safe USING, empty ZORDER") {
    import spark.implicits._
    // a keep-forever window SATURATES instead of overflowing negative
    // (negative retention would expire every tombstone the window was
    // declared to protect); a >19-digit count falls back, never throws
    assert(LT.deltaIntervalMs("interval 20000000000 weeks")
      .contains(Long.MaxValue))
    assert(LT.deltaIntervalMs(
      "interval 99999999999999999999 days").contains(Long.MaxValue))

    // a renamed column whose field-id is already mapped under the OLD
    // name MERGES into that entry (MappingUtil.update) — never a
    // second entry for the same id, which spec readers reject
    val root = freshRoot("nmRename")
    LT.create(Seq((1L, "a")).toDF("k", "s").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    def meta(): String = {
      val n = Files.readString(
        Paths.get(root, "metadata", "version-hint.text")).trim.toLong
      Files.readString(Paths.get(root, "metadata", s"v$n.metadata.json"))
    }
    // doctor a foreign rename: schema column 's' renamed to 's2' while
    // the mapping still says 's' (what a foreign writer that skips
    // MappingUtil.update leaves behind)
    val n0 = Files.readString(
      Paths.get(root, "metadata", "version-hint.text")).trim.toLong
    val mp = Paths.get(root, "metadata", s"v$n0.metadata.json")
    Files.writeString(mp, Files.readString(mp).replace(
      """"name":"s"""", """"name":"s2""""))
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((2L, "b")).toDF("k", "s2").coalesce(1))
    val mapping = om.readTree(om.readTree(meta()).get("properties")
      .get("schema.name-mapping.default").asText())
    val entries = mapping.elements().asScala.toSeq
    val ids = entries.map(_.get("field-id").asInt())
    assert(ids.distinct.size == ids.size,
      s"duplicate field-id minted: $mapping")
    val s2Entry = entries.find(e =>
      e.get("names").elements().asScala.exists(_.asText() == "s2"))
    assert(s2Entry.isDefined && s2Entry.get.get("names").elements()
      .asScala.map(_.asText()).toSet == Set("s", "s2"),
      s"rename must merge into the existing entry: $mapping")

    // a ')' inside a line comment or backtick identifier in the USING
    // body must not close the source early
    val proot = freshRoot("mcomment")
    LT.create(Seq((1L, "a")).toDF("k", "s").coalesce(1), proot)
    graft.sql.GraftCatalog.register(spark, "r14_comment_t", proot, Nil)
    spark.sql(
      """MERGE INTO r14_comment_t AS t USING (
           SELECT 2L AS k, 'x' AS s -- deduped upstream :)
         ) AS src ON t.k = src.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(LT.read(spark, proot).count() == 2)

    // an all-whitespace ZORDER list refuses instead of silently
    // bin-packing
    val zroot = freshRoot("zempty")
    LT.create(Seq((1L, "a")).toDF("k", "s").coalesce(1), zroot)
    LT.exportDeltaLog(spark, zroot)
    wipeManifest(zroot)
    val ex = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE delta_export('$zroot') ZORDER BY ( , )")
    }
    assert(ex.getMessage.contains("at least one column"), ex.getMessage)
  }

  test("MERGE USING body parses by balanced parens (nested join ON inside source)") {
    import spark.implicits._
    val root = freshRoot("mparen")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1), root)
    graft.sql.GraftCatalog.register(spark, "r14_paren_t", root, Nil)
    // the source contains BOTH a ') ... ON' sequence (the join) and
    // parens after it — the greedy regex split used to hand the nested
    // join's ON to the merge and choke; the balanced scan cannot
    spark.sql(
      """MERGE INTO r14_paren_t AS t USING (
           SELECT a.k AS k, concat(a.s, '+') AS s
           FROM (SELECT 2L AS k, 'x' AS s) a
           JOIN (SELECT 2L AS k) b ON (a.k = b.k)
         ) AS src ON t.k = src.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val out = LT.read(spark, root).select($"k", $"s")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "x+"), out.toString)
    // a malformed tail refuses with the merge's own message, not a
    // pass-through to Spark's parser
    val ex = intercept[Exception] {
      spark.sql(
        """MERGE INTO r14_paren_t AS t USING (SELECT 1L AS k, 'z' AS s)
           AS src ON t.k = src.k
           WHEN MATCHED THEN UPDATE SET s = 'nope'""")
    }
    assert(ex.getMessage.contains("MERGE") ||
      ex.getMessage.toLowerCase.contains("syntax"), ex.getMessage)
  }
}
