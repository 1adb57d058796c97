package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaDv, LakehouseTable => LT}

/** Round-8 pins: spec-exact DV blob layout (the RoaringBitmapArray
  * portable form with keyed non-empty buckets), complete protocol
  * feature lists, vacuum-safe file-cap admission, the hive-layout import
  * guard, declared-timezone generated columns, and the memoized
  * scheme-aware pruning rule. */
class Round8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/r8_$name"
    val p = Paths.get(r)
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(p)
    r
  }

  test("DV portable layout is byte-identical to Roaring64NavigableMap.serializePortable") {
    import org.roaringbitmap.longlong.Roaring64NavigableMap
    // sparse buckets (0, 5) with a gap: the portable form must write TWO
    // keyed buckets, never six dense keyless ones
    val cases = Seq(
      Array(3L, 100L, (5L << 32) | 7L),
      Array(0L, 1L, 0xfffffffeL, (1L << 32) + 5L, (3L << 32) + 9L),
      Array(42L),
      Array.empty[Long])
    cases.foreach { pos =>
      val m = new Roaring64NavigableMap()
      pos.foreach(m.addLong)
      m.runOptimize()
      val baos = new java.io.ByteArrayOutputStream()
      m.serializePortable(new java.io.DataOutputStream(baos))
      val reference = baos.toByteArray
      val ours = DeltaDv.serializeRoaringArray(pos)
      assert(ours.toSeq == reference.toSeq,
        s"portable layout diverges for ${pos.mkString(",")}")
      // and the reader decodes the REFERENCE bytes (a genuinely foreign DV)
      assert(DeltaDv.deserializeRoaringArray(reference).sorted.toSeq ==
        pos.sorted.toSeq)
    }
  }

  test("protocol action lists ALL active features: columnMapping rides the DV upgrade, either order") {
    import spark.implicits._
    // order 1: rename (mapping active) FIRST, then a MOR delete — the
    // (3,7) upgrade must list columnMapping alongside deletionVectors
    val root = freshRoot("protofeat")
    LT.create((0L until 40L).map(i => (i, s"v$i")).toDF("id", "payload"), root)
    LT.alterRenameColumn(spark, root, "payload", "body")
    LT.deleteWhereMor(spark, root, "id < 5")
    LT.exportDeltaLog(spark, root)
    val logDir = Paths.get(root, "_delta_log")
    import scala.jdk.CollectionConverters._
    val logTxt = Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .toSeq.sortBy(_.getFileName.toString)
      .map(Files.readString(_)).mkString("\n")
    val dvProto = logTxt.linesIterator
      .filter(_.contains("\"minReaderVersion\":3")).toSeq
    assert(dvProto.nonEmpty, "no (3,7) protocol action exported")
    dvProto.foreach { l =>
      assert(l.contains("deletionVectors") && l.contains("columnMapping"),
        s"(3,7) protocol must list every active feature, got: $l")
    }
    // order 2: MOR delete FIRST (DV upgrade with no mapping), then a
    // rename — the mapping announcement must RE-EMIT (3,7) with both
    // features, not downgrade the table to (2,5)
    val root2 = freshRoot("protofeat2")
    LT.create((0L until 40L).map(i => (i, s"v$i")).toDF("id", "payload"), root2)
    LT.deleteWhereMor(spark, root2, "id < 5")
    LT.exportDeltaLog(spark, root2)
    LT.alterRenameColumn(spark, root2, "payload", "body")
    LT.exportDeltaLog(spark, root2)
    val vs = Files.list(Paths.get(root2, "_delta_log")).iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .toSeq.sortBy(_.getFileName.toString)
    val lastProto = vs.flatMap(p => Files.readString(p).linesIterator
        .filter(_.contains("\"protocol\"")).toSeq)
      .lastOption.getOrElse(fail("no protocol actions"))
    assert(lastProto.contains("\"minReaderVersion\":3") &&
      lastProto.contains("columnMapping") &&
      lastProto.contains("deletionVectors"),
      s"mapping-after-DV must re-emit (3,7) with both features, got: $lastProto")
    // replay sanity on both: the foreign-log read still matches native
    val native = LT.read(spark, root2).orderBy("id").collect().toSeq
    val foreign = LT.readDeltaExport(spark, root2).orderBy("id").collect().toSeq
    assert(native == foreign)
  }

  test("file-cap admission survives VACUUM of a consumed cursor's diff base") {
    import spark.implicits._
    val root = freshRoot("vacuumcap")
    LT.create((0L until 10L).map(i => (i, "a")).toDF("id", "s"), root)
    LT.append(Seq((100L, "b")).toDF("id", "s"), root)
    LT.append(Seq((200L, "c")).toDF("id", "s"), root)
    val src = new graft.streaming.GraftTableSource(spark, root,
      LT.read(spark, root).schema, ignoreChanges = false,
      maxFilesPerBatch = Some(100))
    // catch up fully: the cursor parks as a whole-version offset at v2
    val o1 = src.getOffset.get
    src.getBatch(None, o1)
    // drop every manifest but the current one — the cursor's diff base
    // (v1) is gone, but no file of v2 is needed anymore
    LT.vacuum(root, retainLast = 1)
    LT.append(Seq((300L, "d")).toDF("id", "s"), root)
    val o2 = src.getOffset.get // must NOT throw the removed-by-VACUUM error
    val c2 = graft.streaming.GraftVersionOffset.parse(o2.json)
    assert(c2.v == 3L && c2.filePos.contains(1L),
      s"cursor should advance to v3's single-file diff, got ${o2.json}")
    src.getBatch(Some(o1), o2) // planning the range must not throw either
  }

  test("convertFromDelta hive guard matches path SEGMENTS, not substrings") {
    import spark.implicits._
    // craft a foreign log whose declared partition column 'col' only
    // pseudo-appears in the path as 'xcol=1' — the import must refuse
    val src = freshRoot("hiveguard")
    val dataDir = Paths.get(src, "xcol=1")
    Files.createDirectories(dataDir)
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(dataDir.toString + "/out")
    val part = Files.list(Paths.get(dataDir.toString, "out")).iterator()
    import scala.jdk.CollectionConverters._
    val pq = part.asScala.find(_.toString.endsWith(".parquet")).get
    val rel = s"xcol=1/${pq.getFileName}"
    Files.move(pq, dataDir.resolve(pq.getFileName))
    val logDir = Paths.get(src, "_delta_log")
    Files.createDirectories(logDir)
    val schema = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"v\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    Files.writeString(logDir.resolve("00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":["col"],"configuration":{}}}
{"add":{"path":"$rel","partitionValues":{"col":"1"},"size":1,"modificationTime":0,"dataChange":true}}
""")
    val ex = intercept[IllegalArgumentException] {
      LT.convertFromDelta(spark, src, freshRoot("hiveguard_dst"))
    }
    assert(ex.getMessage.contains("not encoded in the path"))
  }

  test("generated date partitions pin the DECLARING timezone; legacy un-zoned 'date' never derives") {
    import spark.implicits._
    val origTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // declare under America/Los_Angeles: stored kind records the zone
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val root = freshRoot("gentz")
      // hourly stamps across two UTC days that are ONE LA day
      val ev = (0L until 48L).map { i =>
        (i, new java.sql.Timestamp(1704096000000L + i * 3600 * 1000))
      }.toDF("event_id", "ts")
        .withColumn("day", LT.generatedPartitionColumn(
          "date@America/Los_Angeles", col("ts")))
      LT.create(ev, root, partitionBy = Seq("day"))
      LT.alterSetGeneratedPartition(spark, root, "day", "date", "ts")
      val stored = LT.generatedColsAt(root, LT.currentVersion(root).get)
      assert(stored == Seq(("day", "date@America/Los_Angeles", "ts")),
        s"declaring TZ not pinned: $stored")
      // read under UTC: derived pruning must use the DECLARED zone —
      // rows and partition count both correct despite the TZ flip
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val q = LT.read(spark, root)
        .filter(col("ts") >= lit("2024-01-01 18:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-02 18:00:00").cast("timestamp"))
      assert(q.count() == 24)
      val parts = q.queryExecution.executedPlan.collectLeaves().head match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
        case _ => -1
      }
      // 2024-01-01 18:00Z..2024-01-02 18:00Z = LA 01-01 10:00 .. 01-02
      // 10:00 → exactly the two LA-day dirs
      assert(parts == 2, s"declared-zone pruning read $parts dirs")
      // writers in a different session TZ produce the DECLARED zone's
      // partition values via withGeneratedPartitions
      val extra = Seq((99L, new java.sql.Timestamp(1704153600000L)))
        .toDF("event_id", "ts") // 2024-01-02 00:00Z = LA 2024-01-01
      LT.append(LT.withGeneratedPartitions(root, extra), root,
        partitionBy = Seq("day"))
      val added = LT.read(spark, root).filter(col("event_id") === 99L)
        .select("day").as[java.sql.Date].head()
      assert(added.toString == "2024-01-01",
        s"UTC-session writer must land in the LA day dir, got $added")
    } finally spark.conf.set("spark.sql.session.timeZone", origTz)
  }

  test("foreign DV decode is distributed: many files, many DVs, no driver-side position relation") {
    import spark.implicits._
    val root = freshRoot("dvdist")
    // 8 files (repartition), then two MOR deletes covering most of them
    LT.create((0L until 400L).map(i => (i, i % 7)).toDF("id", "g")
      .repartition(8), root)
    LT.deleteWhereMor(spark, root, "id % 5 = 0")
    LT.deleteWhereMor(spark, root, "id % 3 = 0")
    LT.exportDeltaLog(spark, root)
    val foreign = LT.readDeltaExport(spark, root)
    // correctness first: foreign read ≡ native read
    val native = LT.read(spark, root).orderBy("id").collect().toSeq
    assert(foreign.orderBy("id").collect().toSeq == native)
    // 400 − |5∣id| − |3∣id| + |15∣id| = 400 − 80 − 134 + 27
    assert(native.size == 213)
    // the DV side of the anti-join must be the distributed decode
    // (SerializeFromObject over the descriptor dataset), never a
    // LocalRelation/LocalTableScan of driver-materialized positions
    val plan = foreign.queryExecution.optimizedPlan.toString
    assert(plan.contains("SerializeFromObject"),
      s"expected executor-side DV decode in the plan:\n$plan")
    val localRows = foreign.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.size
    }
    assert(localRows.forall(_ <= 16),
      s"driver-materialized relation of ${localRows.max} rows in the DV plan")
  }

  test("timestampAsOf on a foreign log: three-stamp travel via exported commitInfo") {
    import spark.implicits._
    val root = freshRoot("tsasof")
    LT.create(Seq((1L, "a")).toDF("id", "s"), root)
    LT.append(Seq((2L, "b")).toDF("id", "s"), root)
    LT.append(Seq((3L, "c")).toDF("id", "s"), root)
    LT.exportDeltaLog(spark, root)
    // the export carries each version's in-commit timestamp as commitInfo
    val log0 = Files.readString(
      Paths.get(root, "_delta_log", "00000000000000000000.json"))
    assert(log0.contains("\"commitInfo\""), s"no commitInfo in v0 log:\n$log0")
    val ts = (0L to 2L).map(v => LT.commitTsAt(root, v).get)
    assert(ts == ts.sorted && ts.distinct.size == 3)
    // pin at each commit stamp (and between): version state reproduced
    def idsAt(t: Long): Seq[Long] =
      LT.readDeltaExport(spark, root, timestampAsOf = Some(t))
        .select("id").as[Long].collect().toSeq.sorted
    assert(idsAt(ts(0)) == Seq(1L))
    assert(idsAt(ts(1)) == Seq(1L, 2L))
    assert(idsAt((ts(1) + ts(2)) / 2) == Seq(1L, 2L))
    assert(idsAt(ts(2)) == Seq(1L, 2L, 3L))
    assert(idsAt(Long.MaxValue) == Seq(1L, 2L, 3L))
    // before the first commit: no version qualifies — loud, not empty
    intercept[IllegalStateException] {
      LT.readDeltaExport(spark, root, timestampAsOf = Some(ts(0) - 1))
    }
    // mutually exclusive with versionAsOf
    intercept[IllegalArgumentException] {
      LT.readDeltaExport(spark, root, versionAsOf = Some(1L),
        timestampAsOf = Some(ts(1)))
    }
  }

  test("maxBytesPerBatch splits a mixed-size commit; one oversized file still moves the stream") {
    import spark.implicits._
    val root = freshRoot("bytecap")
    LT.create(Seq((0L, "seed", 9)).toDF("id", "s", "grp"), root,
      partitionBy = Seq("grp"))
    // one commit: 1 large file (2000 distinct long strings, grp 0) + 4
    // single-row files (grps 1-4) — hive partitioning on grp with a
    // single write task isolates each group in exactly one file
    val rows = ((0L until 2000L).map(i =>
        (1000L + i, "%06d".format(i) * 30, 0)) ++
      (1L to 4L).map(i => (i, "s", i.toInt))).toDF("id", "s", "grp")
    // source created at v0: consume the snapshot FIRST so the mixed
    // commit arrives as a tail diff under the byte cap
    val srcSchema = LT.read(spark, root).schema
    LT.append(rows.coalesce(1), root, partitionBy = Seq("grp"))
    val v1Files = LT.manifestFiles(root, 1L)
      .filterNot(LT.manifestFiles(root, 0L).toSet).sorted
    assert(v1Files.size == 5)
    val sizes = v1Files.map(f => LT.dataFileSize(root, f))
    val cap = sizes.max / 2 // smaller than the big file, larger than any small
    assert(sizes.count(_ > cap) == 1)
    val src = new graft.streaming.GraftTableSource(spark, root,
      srcSchema, ignoreChanges = false,
      maxBytesPerBatch = Some(cap), startingVersion = Some(0L))
    var cursor: org.apache.spark.sql.execution.streaming.Offset =
      graft.streaming.GraftVersionOffset(0L)
    val batchFiles = scala.collection.mutable.ArrayBuffer.empty[Long]
    var guard = 0
    while (guard < 20 && {
      val nxt = src.getOffset.get
      if (nxt.json != cursor.json) {
        val c0 = graft.streaming.GraftVersionOffset.parse(cursor.json)
        val c1 = graft.streaming.GraftVersionOffset.parse(nxt.json)
        src.getBatch(Some(cursor), nxt)
        batchFiles += c1.filePos.getOrElse(0L) -
          (if (c0.v == c1.v) c0.filePos.getOrElse(0L) else 0L)
        cursor = nxt; true
      } else false
    }) guard += 1
    // the hive file list sorts grp=0 (the oversized file) first: it must
    // arrive ALONE (admitted despite exceeding the cap — progress over
    // stall), then the four small files fit one byte budget together
    assert(batchFiles.toSeq == Seq(1L, 4L),
      s"expected the commit split as [big][4 small], got $batchFiles")
  }

  test("Iceberg mirror: v2 snapshot lineage, manifest reuse, schema evolution, write-through, guards") {
    import spark.implicits._
    import graft.sources.IcebergMeta
    val root = freshRoot("iceberg")
    LT.create((0L until 90L).map(i => (i, s"v$i", i % 3)).toDF("id", "s", "k"),
      root, partitionBy = Seq("k"))
    LT.append((90L until 120L).map(i => (i, s"v$i", i % 3)).toDF("id", "s", "k"),
      root, partitionBy = Seq("k"))
    LT.deleteWhere(spark, root, "id % 10 = 0", Seq("k"))
    IcebergMeta.exportIcebergMeta(spark, root)
    val dir = Paths.get(root, "metadata")
    // chain shape: hint + one metadata.json per graft version
    assert(Files.readString(dir.resolve("version-hint.text")).trim == "3")
    (1 to 3).foreach(n =>
      assert(Files.exists(dir.resolve(s"v$n.metadata.json"))))
    // lineage: sequence numbers ascend, parents chain, ops recorded
    val snaps = IcebergMeta.snapshots(root)
    assert(snaps.map(_.seq) == Seq(1L, 2L, 3L))
    assert(snaps.head.parent == -1L)
    assert(snaps.sliding(2).forall { case Seq(a, b) => b.parent == a.id })
    assert(snaps.map(_.operation) == Seq("append", "append", "overwrite"))
    // manifest REUSE: the v1 append's manifest list references v0's
    // manifest unchanged plus ONE new manifest; the v2 delete rewrites
    def manifestPaths(s: IcebergMeta.SnapshotInfo): Seq[String] = {
      import org.apache.avro.file.DataFileReader
      import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
      val r = new DataFileReader(new java.io.File(s.manifestList),
        new GenericDatumReader[GenericRecord]())
      import scala.jdk.CollectionConverters._
      try r.iterator().asScala.map(_.get("manifest_path").toString).toSeq
      finally r.close()
    }
    val (m0, m1, m2) = (manifestPaths(snaps(0)), manifestPaths(snaps(1)),
      manifestPaths(snaps(2)))
    assert(m0.size == 1 && m1.size == 2 && m1.head == m0.head,
      s"append must reuse v0's manifest: $m0 / $m1")
    assert(m2.size == 1 && !m1.contains(m2.head),
      s"delete must rewrite the manifest chain: $m2")
    // foreign read ≡ native, current and time travel
    val native = LT.read(spark, root).orderBy("id").collect().toSeq
    val ice = IcebergMeta.readIceberg(spark, root)
      .select("id", "s", "k").orderBy("id").collect().toSeq
    assert(ice == native)
    val nativeV1 = LT.read(spark, root, Some(1L))
      .orderBy("id").collect().toSeq
    val iceV1 = IcebergMeta.readIceberg(spark, root,
        snapshotAsOf = Some(IcebergMeta.snapshotId(root, 1L)))
      .select("id", "s", "k").orderBy("id").collect().toSeq
    assert(iceV1 == nativeV1)
    // WRITE-THROUGH: a plain append after the export advances the chain
    // via the commit hook — no explicit export call
    LT.append(Seq((500L, "w", 1L)).toDF("id", "s", "k"), root,
      partitionBy = Seq("k"))
    assert(Files.readString(dir.resolve("version-hint.text")).trim == "4",
      "commit hook did not advance the Iceberg chain")
    assert(IcebergMeta.readIceberg(spark, root).count() == native.size + 1)
    // SCHEMA EVOLUTION: ADD COLUMNS re-registers; old snapshots keep
    // their schema-id, new reads null-fill old rows
    LT.alterAddColumns(root, "extra BIGINT")
    LT.append(Seq((600L, "x", 2L, 42L)).toDF("id", "s", "k", "extra"),
      root, partitionBy = Seq("k"))
    val snaps2 = IcebergMeta.snapshots(root)
    assert(snaps2.last.schemaId > snaps2.head.schemaId,
      s"ADD COLUMNS must register a new schema-id: ${snaps2.map(_.schemaId)}")
    val cur = IcebergMeta.readIceberg(spark, root)
    assert(cur.columns.contains("extra"))
    assert(cur.filter(col("id") === 600L).select("extra")
      .as[Long].head() == 42L)
    assert(cur.filter(col("id") === 500L).select("extra")
      .head().isNullAt(0))
    // GUARDS: mapped/widened/DV-bearing histories refuse loudly
    val root2 = freshRoot("iceberg_guard")
    LT.create(Seq((1L, "a")).toDF("id", "payload"), root2)
    LT.alterRenameColumn(spark, root2, "payload", "body")
    val ex = intercept[IllegalArgumentException] {
      IcebergMeta.exportIcebergMeta(spark, root2)
    }
    assert(ex.getMessage.contains("column mapping"))
    // (unpartitioned MOR tables are NOT refused — they mirror as
    // position-delete files; pinned by the dedicated DV round-trip test)
  }

  test("Iceberg mirror round-trips MOR deletion vectors as position-delete files") {
    import spark.implicits._
    import graft.sources.IcebergMeta
    val root = freshRoot("iceberg_dv")
    LT.create((0L until 60L).map(i => (i, i % 4)).toDF("id", "g")
      .coalesce(3), root)
    LT.deleteWhereMor(spark, root, "id % 5 = 0")
    IcebergMeta.exportIcebergMeta(spark, root)
    val dir = Paths.get(root, "metadata")
    // the DV snapshot carries a position-delete parquet + delete manifest
    val sid1 = IcebergMeta.snapshotId(root, 1L)
    val delFile = dir.resolve(s"delete-$sid1.parquet")
    assert(Files.exists(delFile), "no position-delete parquet exported")
    val del = spark.read.parquet(delFile.toString)
    assert(del.columns.toSeq == Seq("file_path", "pos"))
    assert(del.count() == 12) // 60/5 deleted positions
    val snaps = IcebergMeta.snapshots(root)
    assert(snaps.map(_.operation) == Seq("append", "delete"))
    // foreign read applies the deletes; time travel to v0 does not
    val native = LT.read(spark, root).orderBy("id").collect().toSeq
    assert(IcebergMeta.readIceberg(spark, root)
      .orderBy("id").collect().toSeq == native)
    assert(IcebergMeta.readIceberg(spark, root,
        snapshotAsOf = Some(IcebergMeta.snapshotId(root, 0L))).count() == 60)
    // a SECOND MOR delete rewrites the delete state (new file, old one
    // kept for the earlier snapshot's time travel)
    LT.deleteWhereMor(spark, root, "id % 7 = 0") // hook advances the chain
    val sid2 = IcebergMeta.snapshotId(root, 2L)
    assert(Files.exists(dir.resolve(s"delete-$sid2.parquet")))
    val native2 = LT.read(spark, root).orderBy("id").collect().toSeq
    assert(IcebergMeta.readIceberg(spark, root)
      .orderBy("id").collect().toSeq == native2)
    assert(IcebergMeta.readIceberg(spark, root,
        snapshotAsOf = Some(sid1)).orderBy("id").collect().toSeq == native)
    // IMPORT the DV-bearing chain: position deletes become a native DV
    // sidecar; the imported table reads identically
    val dst = freshRoot("iceberg_dv_dst")
    IcebergMeta.convertToGraft(spark, root, dst)
    assert(LT.dvsAt(dst, 0L).nonEmpty, "import dropped the DV state")
    assert(LT.read(spark, dst).orderBy("id").collect().toSeq == native2)
    // a COW REWRITE carrying unchanged DVs must RE-STAMP the delete
    // state at the new sequence number: spec readers apply position
    // deletes only to data files with data-seq <= delete-seq, and the
    // rewrite re-lists carried files at the rewrite's sequence — an
    // older delete manifest would resurrect the carried files' deletions
    LT.append(Seq((100L, 9L)).toDF("id", "g"), root) // own file, id%35 != 0
    LT.deleteWhere(spark, root, "id = 100") // rewrites only the new file
    assert(LT.dvsAt(root, LT.currentVersion(root).get).nonEmpty,
      "precondition: DVs must survive the partial rewrite")
    val sidRw = IcebergMeta.snapshotId(root, LT.currentVersion(root).get)
    assert(Files.exists(dir.resolve(s"delete-$sidRw.parquet")),
      "rewrite with carried DVs must re-stamp the position-delete state")
    val nativeRw = LT.read(spark, root).orderBy("id").collect().toSeq
    assert(IcebergMeta.readIceberg(spark, root)
      .orderBy("id").collect().toSeq == nativeRw)
    // PARTITIONED MOR tables: the delete state is partition-scoped —
    // one delete file per hive partition with deletions, each manifest
    // entry carrying its partition values (the spec's pruning shape)
    val root2 = freshRoot("iceberg_dv_part")
    LT.create((0L until 40L).map(i => (i, i % 2)).toDF("id", "k"),
      root2, partitionBy = Seq("k"))
    LT.deleteWhereMor(spark, root2, "id < 4") // touches both k=0 and k=1
    IcebergMeta.exportIcebergMeta(spark, root2)
    val dir2 = Paths.get(root2, "metadata")
    import scala.jdk.CollectionConverters._
    val delFiles = Files.list(dir2).iterator().asScala
      .filter(_.getFileName.toString.startsWith("delete-")).toSeq
    assert(delFiles.size == 2,
      s"expected one delete file per touched partition, got $delFiles")
    delFiles.foreach { f =>
      val rows = spark.read.parquet(f.toString).collect()
      // each file covers exactly ONE partition dir
      assert(rows.map(_.getString(0).split('/').dropRight(1).last)
        .distinct.length == 1, s"delete file $f spans partitions")
    }
    val nativeP = LT.read(spark, root2).orderBy("id").collect().toSeq
    assert(IcebergMeta.readIceberg(spark, root2)
      .select("id", "k").orderBy("id").collect().toSeq == nativeP)
    // import round-trips the partitioned DV state too
    val dstP = freshRoot("iceberg_dv_part_dst")
    IcebergMeta.convertToGraft(spark, root2, dstP)
    assert(LT.read(spark, dstP).select("id", "k")
      .orderBy("id").collect().toSeq == nativeP)
  }

  test("vacuum expires Iceberg snapshots and truncates checkpointed Delta logs") {
    import spark.implicits._
    import graft.sources.IcebergMeta
    val root = freshRoot("expiry")
    LT.create(Seq((0L, "a")).toDF("id", "v"), root)
    (1L until 12L).foreach(i =>
      LT.append(Seq((i, "x")).toDF("id", "v"), root))
    LT.exportDeltaLog(spark, root)
    // force a checkpoint at v10 (the write-through cadence would have
    // done this had the log existed during the appends)
    LT.exportDeltaCheckpoint(spark, root, 10L)
    IcebergMeta.exportIcebergMeta(spark, root)
    val metaDir = Paths.get(root, "metadata")
    assert(IcebergMeta.snapshots(root).size == 12)
    import scala.jdk.CollectionConverters._
    def logFiles(): Seq[String] = Files.list(Paths.get(root, "_delta_log"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.matches("\\d{20}\\.json")).toSeq.sorted
    assert(logFiles().size == 12)
    // vacuum keeps the last 2 versions: the chain expires to 2 snapshots
    // and dead log JSONs below the v10 checkpoint disappear
    LT.vacuum(root, retainLast = 2)
    val snaps = IcebergMeta.snapshots(root)
    assert(snaps.map(_.seq) == Seq(11L, 12L),
      s"expiry should keep the last two snapshots, got ${snaps.map(_.seq)}")
    // the chain still reads (both remaining snapshots)
    assert(IcebergMeta.readIceberg(spark, root).count() == 12)
    assert(IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(snaps.head.id)).count() == 11)
    intercept[IllegalArgumentException] {
      IcebergMeta.readIceberg(spark, root,
        snapshotAsOf = Some(IcebergMeta.snapshotId(root, 0L)))
    }
    // expired artifacts gone: one metadata file, two manifest lists
    val names = Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.count(_.matches("v\\d+\\.metadata\\.json")) == 1)
    assert(names.count(_.startsWith("snap-")) == 2)
    // Delta logs: dropped versions below the checkpoint are gone; the
    // checkpoint version and the tail (and nothing the replay needs)
    // remain — the checkpoint-seeded read still matches native
    val remaining = logFiles().map(_.take(20).toLong)
    assert(!remaining.exists(v => v < 10L),
      s"dead logs below the checkpoint survive: $remaining")
    assert(LT.readDeltaExport(spark, root).orderBy("id").collect().toSeq ==
      LT.read(spark, root).orderBy("id").collect().toSeq)
    // the full-JSON replay path refuses the truncated log loudly
    val ex = intercept[IllegalArgumentException] {
      LT.readDeltaExport(spark, root, useCheckpoint = false)
    }
    assert(ex.getMessage.contains("truncated"))
    val ex2 = intercept[IllegalArgumentException] {
      LT.convertFromDelta(spark, root, freshRoot("expiry_dst"))
    }
    assert(ex2.getMessage.contains("truncated"))
  }

  test("pruning rule memoizes: repeated planning never re-reads the manifest") {
    import spark.implicits._
    val root = freshRoot("genmemo")
    val df = (0L until 300L).map(i => (i, s"v$i")).toDF("id", "v")
      .withColumn("bucket", LT.generatedPartitionColumn("div:100", col("id")))
    LT.create(df, root, partitionBy = Seq("bucket"))
    LT.alterSetGeneratedPartition(spark, root, "bucket", "div:100", "id")
    def planOnce(): Int = {
      val q = LT.read(spark, root).filter(col("id") === 250)
      assert(q.count() == 1)
      q.queryExecution.executedPlan.collectLeaves().head match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
        case _ => -1
      }
    }
    assert(planOnce() == 1, "rule must fire (one pruned dir)")
    val readsAfterFirst = graft.plans.GeneratedPartitionPruning.manifestReads.get()
    (1 to 3).foreach(_ => assert(planOnce() == 1))
    val readsAfterMore = graft.plans.GeneratedPartitionPruning.manifestReads.get()
    assert(readsAfterMore == readsAfterFirst,
      s"re-planning re-read the manifest ($readsAfterFirst -> $readsAfterMore)")
  }
}
