package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaDv, LakehouseTable => LT}

/** Round-7 pins: Delta deletion-vector interop (codec, foreign read,
  * mirror export), id-mode column mapping, and the identity-enable
  * guard. */
class Round7Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/r7_$name"
    val p = Paths.get(r)
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(p)
    r
  }

  test("DeltaDv codec round-trips: z85, 64-bit roaring array, blob file, inline") {
    // z85: 4-byte blocks, known alphabet, round-trip
    val bytes = Array.tabulate(16)(i => (i * 37 - 128).toByte)
    assert(DeltaDv.z85Decode(DeltaDv.z85Encode(bytes)).toSeq == bytes.toSeq)
    // roaring array: positions spanning multiple 32-bit buckets, unsigned
    // low words, empties between buckets
    val pos = Array(0L, 1L, 17L, 0xfffffffeL, (1L << 32) + 5L, (3L << 32) + 9L)
    assert(DeltaDv.deserializeRoaringArray(
      DeltaDv.serializeRoaringArray(pos)).sorted.toSeq == pos.sorted.toSeq)
    assert(DeltaDv.serializeRoaringArray(Array.empty[Long]).nonEmpty)
    assert(DeltaDv.deserializeRoaringArray(
      DeltaDv.serializeRoaringArray(Array.empty[Long])).isEmpty)
    // blob file write → descriptor → read (uuid storage, CRC verified)
    val dir = freshRoot("dvcodec")
    val d = DeltaDv.writeDvFile(dir, "seed-1", pos)
    assert(d.storageType == "u" && d.cardinality == pos.length)
    assert(DeltaDv.readPositions(dir, d).sorted.toSeq == pos.sorted.toSeq)
    // deterministic: same seed → same descriptor and file (idempotent
    // concurrent export)
    val d2 = DeltaDv.writeDvFile(dir, "seed-1", pos)
    assert(d2 == d)
    // inline storage: z85 of the padded data, true length in sizeInBytes
    val bitmaps = DeltaDv.serializeRoaringArray(pos)
    val data = java.nio.ByteBuffer.allocate(4 + bitmaps.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(DeltaDv.Magic).put(bitmaps).array()
    val padded = java.util.Arrays.copyOf(data, (data.length + 3) / 4 * 4)
    val inline = DeltaDv.Descriptor("i", DeltaDv.z85Encode(padded), 0L,
      data.length.toLong, pos.length.toLong)
    assert(DeltaDv.readPositions(dir, inline).sorted.toSeq == pos.sorted.toSeq)
  }

  test("readDeltaExport honors a hand-written FOREIGN DV-bearing log") {
    import spark.implicits._
    // a "foreign writer": plain parquet files + a _delta_log we author by
    // hand, with a DV on one file (uuid blob) and on another (inline) —
    // no graft manifest anywhere
    val root = freshRoot("foreign_dv")
    val dataDir = Paths.get(root, "data")
    Files.createDirectories(dataDir)
    def writeOne(name: String, ids: Seq[Long]): Unit = {
      val tmp = Files.createTempDirectory("r7dv")
      ids.toDF("id").coalesce(1).write.mode("overwrite")
        .parquet(tmp.resolve("out").toString)
      import scala.jdk.CollectionConverters._
      val part = Files.list(tmp.resolve("out")).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, dataDir.resolve(name))
    }
    writeOne("f1.parquet", 1L to 10L)   // row_index 0..9
    writeOne("f2.parquet", 11L to 20L)
    // DV on f1: delete row indexes 0 and 3 (ids 1, 4) via a uuid blob
    val d1 = DeltaDv.writeDvFile(root, "foreign-f1", Array(0L, 3L))
    // DV on f2: delete row index 9 (id 20) inline
    val bm = DeltaDv.serializeRoaringArray(Array(9L))
    val data = java.nio.ByteBuffer.allocate(4 + bm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(DeltaDv.Magic).put(bm).array()
    val padded = java.util.Arrays.copyOf(data, (data.length + 3) / 4 * 4)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType).json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val logDir = Paths.get(root, "_delta_log")
    Files.createDirectories(logDir)
    Files.writeString(logDir.resolve(f"${0L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}
{"metaData":{"id":"foreign-1","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{}}}
{"add":{"path":"data/f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"${d1.pathOrInlineDv}","offset":${d1.offset},"sizeInBytes":${d1.sizeInBytes},"cardinality":${d1.cardinality}}}}
{"add":{"path":"data/f2.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"${DeltaDv.z85Encode(padded)}","offset":0,"sizeInBytes":${data.length},"cardinality":1}}}
""")
    val got = LT.readDeltaExport(spark, root).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got == ((1L to 20L).toSet -- Set(1L, 4L, 20L)).toSeq.sorted,
      s"foreign DV read returned $got")
    // a later commit REPLACING f1's DV (remove + re-add, how Delta
    // commits a DV update) must win over v0's descriptor
    val d1b = DeltaDv.writeDvFile(root, "foreign-f1-v2", Array(0L))
    Files.writeString(logDir.resolve(f"${1L}%020d.json"),
      s"""{"remove":{"path":"data/f1.parquet","deletionTimestamp":0,"dataChange":true}}
{"add":{"path":"data/f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"${d1b.pathOrInlineDv}","offset":${d1b.offset},"sizeInBytes":${d1b.sizeInBytes},"cardinality":${d1b.cardinality}}}}
""")
    val got2 = LT.readDeltaExport(spark, root).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got2 == ((1L to 20L).toSet -- Set(1L, 20L)).toSeq.sorted)
    // a foreign writer may order action fields differently — "path"
    // after other keys (including a DV object) must still parse
    Files.writeString(logDir.resolve(f"${2L}%020d.json"),
      s"""{"remove":{"dataChange":true,"deletionTimestamp":0,"path":"data/f2.parquet"}}
{"add":{"partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"${d1b.pathOrInlineDv}","offset":${d1b.offset},"sizeInBytes":${d1b.sizeInBytes},"cardinality":${d1b.cardinality}},"path":"data/f2.parquet"}}
""")
    // f2 re-added with a REPLACING DV deleting row_index 0 (id 11);
    // the old inline DV (id 20) is superseded, so 20 comes back
    val got3 = LT.readDeltaExport(spark, root).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got3 == ((2L to 20L).toSet -- Set(11L)).toSeq.sorted,
      s"non-path-first actions misparsed: $got3")
    // adversarial shadowing: a partition column literally named 'path'
    // appears in partitionValues BEFORE the real file path, and the
    // protocol line's fields arrive reversed with feature lists
    // interposed — the depth-aware scanner must take the TOP-LEVEL key
    Files.writeString(logDir.resolve(f"${3L}%020d.json"),
      s"""{"protocol":{"minWriterVersion":7,"readerFeatures":["deletionVectors"],"minReaderVersion":3,"writerFeatures":["deletionVectors"]}}
{"remove":{"deletionTimestamp":0,"path":"data/f1.parquet","dataChange":true}}
{"add":{"partitionValues":{"path":"TRAP"},"size":1,"modificationTime":0,"dataChange":true,"path":"data/f1.parquet"}}
""")
    // f1 restored DV-free (1..10); f2 still missing id 11
    val got4 = LT.readDeltaExport(spark, root).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got4 == ((1L to 20L).toSet -- Set(11L)).toSeq.sorted,
      s"shadowed 'path' key misparsed: $got4")
  }

  test("write-through mirror exports MOR deletes as DV actions; log-only read == native read; checkpoint carries DVs") {
    import spark.implicits._
    val root = freshRoot("mirror_dv")
    LT.create((1L to 40L).map(i => (i, i % 4)).toDF("id", "k"), root)
    LT.exportDeltaLog(spark, root) // arm the write-through mirror
    // MOR delete while mirrored: the commit hook must advance the log
    // with a deletionVector action, no materialize step
    LT.deleteWhereMor(spark, root, "id % 10 = 0")
    def logOnly() = LT.readDeltaExport(spark, root, useCheckpoint = false)
      .select("id").as[Long].collect().sorted.toSeq
    def native() = LT.read(spark, root)
      .select("id").as[Long].collect().sorted.toSeq
    assert(logOnly() == native() && native().size == 36)
    // a second MOR delete MERGES per-file DVs; the re-export must replace
    // the descriptor (remove + re-add), not stack it
    LT.deleteWhereMor(spark, root, "id <= 3")
    assert(logOnly() == native() && native().size == 33)
    // a checkpoint at the DV-active version seeds a reader correctly
    val cur = LT.currentVersion(root).get
    LT.exportDeltaCheckpoint(spark, root, cur)
    assert(LT.readDeltaExport(spark, root, useCheckpoint = true)
      .select("id").as[Long].collect().sorted.toSeq == native())
    // ... and its protocol row carries the feature lists (reader 3 /
    // writer 7 REQUIRE them; a bare version pair is spec-invalid)
    val ckProto = spark.read.parquet(Paths.get(root, "_delta_log")
        .resolve(f"$cur%020d.checkpoint.parquet").toString)
      .filter(col("protocol").isNotNull)
      .select("protocol.minReaderVersion", "protocol.readerFeatures",
        "protocol.writerFeatures").collect().head
    assert(ckProto.getInt(0) == 3 &&
      ckProto.getSeq[String](1) == Seq("deletionVectors") &&
      ckProto.getSeq[String](2) == Seq("deletionVectors"),
      s"checkpoint protocol row incomplete: $ckProto")
    // appends after the checkpoint replay on top of the DV'd seed
    LT.append(Seq((100L, 0L)).toDF("id", "k"), root)
    assert(LT.readDeltaExport(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == native())
  }

  test("readDeltaExport: versionAsOf time travel over the log; root-level foreign files get a valid basePath") {
    import spark.implicits._
    val root = freshRoot("travel_dv")
    LT.create((1L to 20L).map(i => (i, i % 2)).toDF("id", "k"), root)   // v0
    LT.exportDeltaLog(spark, root)
    LT.deleteWhereMor(spark, root, "id > 15")                           // v1
    LT.append(Seq((100L, 0L)).toDF("id", "k"), root)                    // v2
    def exported(v: Long) = LT.readDeltaExport(spark, root,
        versionAsOf = Some(v)).select("id").as[Long].collect().sorted.toSeq
    assert(exported(0) == (1L to 20L))
    assert(exported(1) == (1L to 15L))
    assert(exported(2) == (1L to 15L) :+ 100L)
    // a checkpoint PAST the pinned version must be ignored, not seeded
    LT.exportDeltaCheckpoint(spark, root, 2L)
    assert(exported(0) == (1L to 20L))
    val ex = intercept[IllegalArgumentException] {
      LT.readDeltaExport(spark, root, versionAsOf = Some(99L))
    }
    assert(ex.getMessage.contains("no exported log version"))
    // foreign table with files at the ROOT (no data/ dir): the reader
    // must pick a basePath that is an ancestor of every file
    val root2 = freshRoot("rootfiles")
    val tmp = Files.createTempDirectory("r7root")
    (1L to 5L).toDF("id").coalesce(1).write.mode("overwrite")
      .parquet(tmp.resolve("out").toString)
    import scala.jdk.CollectionConverters._
    val part = Files.list(tmp.resolve("out")).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(root2, "f1.parquet"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType).json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    Files.createDirectories(Paths.get(root2, "_delta_log"))
    Files.writeString(Paths.get(root2, "_delta_log", f"${0L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"rootfiles","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{}}}
{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
""")
    assert(LT.readDeltaExport(spark, root2).select("id")
      .as[Long].collect().sorted.toSeq == (1L to 5L))
  }

  test("convertFromDelta imports a foreign Delta table — DVs, renames, partitions — as a full native table") {
    import spark.implicits._
    // round trip: graft table (partitioned, renamed column, MOR deletes)
    // → Delta export → IMPORT as a fresh native table → identical reads
    val src = freshRoot("conv_src")
    LT.create((1L to 40L).map(i => (i, i % 4, s"v$i")).toDF("id", "k", "w"),
      src, partitionBy = Seq("k"))
    LT.alterRenameColumn(spark, src, "w", "val")
    LT.deleteWhereMor(spark, src, "id % 10 = 0")
    LT.exportDeltaLog(spark, src)
    val dst = freshRoot("conv_dst")
    val v = LT.convertFromDelta(spark, src, dst)
    assert(v == 0L)
    def rows(root: String) = LT.read(spark, root)
      .select("id", "k", "val").as[(Long, Long, String)].collect().sorted.toSeq
    assert(rows(dst) == rows(src) && rows(dst).size == 36)
    // the import is a REAL native table: partition columns derived,
    // further MOR deletes and time travel work
    assert(LT.partitionColumns(dst) == Seq("k"))
    LT.deleteWhereMor(spark, dst, "id = 7")
    assert(LT.read(spark, dst).count() == 35)
    assert(LT.read(spark, dst, Some(0L)).count() == 36) // pre-delete epoch
    // SQL face: CONVERT TO GRAFT imports and registers in one statement
    val dst2 = freshRoot("conv_sql_dst")
    Files.deleteIfExists(Paths.get(dst2)) // command wants a fresh root
    spark.sql(s"CONVERT TO GRAFT '$src' AS r7_converted LOCATION '$dst2'")
    assert(spark.sql(
      "SELECT count(*) FROM r7_converted").collect().head.getLong(0) == 36L)
    assert(graft.sql.GraftCatalog.lookup("r7_converted")
      .exists(_.partitionBy == Seq("k")))
    // id-mode tables refuse (name-based native resolution cannot honor
    // field-id matching) — built in the earlier id-mode test's shape
    val idRoot = freshRoot("conv_idmode")
    Files.createDirectories(Paths.get(idRoot, "_delta_log"))
    val sch = new org.apache.spark.sql.types.StructType()
      .add("user_id", org.apache.spark.sql.types.LongType).json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    Files.writeString(Paths.get(idRoot, "_delta_log", f"${0L}%020d.json"),
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"$sch","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id"}}}
{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
""")
    val ex = intercept[IllegalArgumentException] {
      LT.convertFromDelta(spark, idRoot, freshRoot("conv_idmode_dst"))
    }
    assert(ex.getMessage.contains("id-mode"))
  }

  test("Delta export add actions carry numRecords stats; sum equals the table count") {
    import spark.implicits._
    val root = freshRoot("stats_export")
    LT.create((1L to 35L).map(i => (i, i % 3)).toDF("id", "k"), root)
    LT.append((36L to 50L).map(i => (i, i % 3)).toDF("id", "k"), root)
    LT.exportDeltaLog(spark, root)
    val logDir = Paths.get(root, "_delta_log")
    import scala.jdk.CollectionConverters._
    val txt = Files.list(logDir).iterator().asScala
      .filter(_.toString.endsWith(".json")).map(Files.readString(_)).mkString("\n")
    val counts = """"numRecords\\":(\d+)""".r
      .findAllMatchIn(txt).map(_.group(1).toLong).toSeq
    assert(counts.nonEmpty, "no numRecords stats in the exported log")
    assert(counts.sum == 50L,
      s"per-file numRecords $counts should sum to the table count")
    // integer min/max stats cover the full value range across files
    val mins = """minValues\\":\{\\"id\\":(\d+)""".r
      .findAllMatchIn(txt).map(_.group(1).toLong).toSeq
    val maxs = """maxValues\\":\{\\"id\\":(\d+)""".r
      .findAllMatchIn(txt).map(_.group(1).toLong).toSeq
    assert(mins.nonEmpty && mins.min == 1L && maxs.max == 50L,
      s"id min/max stats wrong: $mins / $maxs")
    // checkpoint rows carry the same stats string
    val cur = LT.currentVersion(root).get
    LT.exportDeltaCheckpoint(spark, root, cur)
    val ck = spark.read.parquet(
      logDir.resolve(f"$cur%020d.checkpoint.parquet").toString)
    val ckCounts = ck.filter(col("add").isNotNull)
      .select(col("add.stats")).as[String].collect()
      .map(s => """"numRecords":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong)
    assert(ckCounts.sum == 50L, s"checkpoint stats $ckCounts")
  }

  test("q161's MOR-deleted fixture table is foreign-readable through its Delta export") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val root = graft.operators.Lakehouse.eventsMorRoot(spark, sf)
    LT.exportDeltaLog(spark, root)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "event_type")
        .as[(Long, Long, String)].collect().sorted.toSeq
    val native = canon(LT.read(spark, root))
    assert(native.nonEmpty)
    assert(canon(LT.readDeltaExport(spark, root, useCheckpoint = false)) == native)
  }

  test("readDeltaExport resolves id-mode column mapping by parquet field id") {
    import spark.implicits._
    val root = freshRoot("idmode")
    val dataDir = Paths.get(root, "data")
    Files.createDirectories(dataDir)
    // physical file: columns named c1/c2 with parquet field ids 1/2
    val fileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c1",
        org.apache.spark.sql.types.LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 1L).build()),
      org.apache.spark.sql.types.StructField("c2",
        org.apache.spark.sql.types.StringType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 2L).build())))
    val rows = (1L to 5L).map(i => org.apache.spark.sql.Row(i, s"u$i"))
    val tmp = Files.createTempDirectory("r7id")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), fileSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.resolve("out").toString)
    import scala.jdk.CollectionConverters._
    val part = Files.list(tmp.resolve("out")).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.move(part, dataDir.resolve("f1.parquet"))
    // foreign log: ID-mode mapping — logical names user_id/name, ids 1/2,
    // physicalNames DELIBERATELY not matching the file's column names, so
    // only field-id resolution can read this table correctly
    val logical = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", 1L)
          .putString("delta.columnMapping.physicalName", "col-aaaa").build()),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", 2L)
          .putString("delta.columnMapping.physicalName", "col-bbbb").build())))
    val schemaEsc = logical.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val logDir = Paths.get(root, "_delta_log")
    Files.createDirectories(logDir)
    Files.writeString(logDir.resolve(f"${0L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
{"metaData":{"id":"foreign-id","format":{"provider":"parquet","options":{}},"schemaString":"$schemaEsc","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2"}}}
{"add":{"path":"data/f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
""")
    val got = LT.readDeltaExport(spark, root)
    assert(got.columns.toSeq == Seq("user_id", "name"))
    assert(got.as[(Long, String)].collect().sorted.toSeq ==
      (1L to 5L).map(i => (i, s"u$i")))
  }

  test("VACUUM RETAIN n HOURS: clock-injected horizon reclaims old versions, keeps current; travel past horizon fails") {
    import spark.implicits._
    val root = freshRoot("vac_hours")
    LT.create((1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"), root)
    Thread.sleep(15)
    LT.overwrite((11L to 20L).map(i => (i, s"b$i")).toDF("id", "v"), root)
    Thread.sleep(15)
    LT.append(Seq((21L, "c")).toDF("id", "v"), root)
    val ts1 = LT.commitTsAt(root, 1L).get
    // horizon exactly at v1's commit ts: v0 (strictly older) reclaims,
    // v1 and the current v2 stay — and v0's overwritten files go with it
    val n = LT.vacuumRetainHours(root, 1.0, nowMillis = ts1 + 3600L * 1000)
    assert(n > 0, "v0's overwritten data files should have been reclaimed")
    assert(LT.versions(root) == Seq(1L, 2L))
    assert(LT.read(spark, root, Some(1L)).count() == 10)
    assert(LT.read(spark, root).count() == 11)
    val ex = intercept[IllegalStateException] {
      LT.read(spark, root, Some(0L)).count()
    }
    assert(ex.getMessage.contains("removed by VACUUM") &&
      ex.getMessage.contains("Available versions"))
    // a generous horizon reclaims nothing
    assert(LT.vacuumRetainHours(root, 24.0) == 0)
    // SQL face: VACUUM t RETAIN n HOURS parses and routes to the
    // time-based path (generous horizon → 0 files)
    graft.sql.GraftCatalog.register(spark, "r7_vac", root, Nil)
    val out = spark.sql("VACUUM r7_vac RETAIN 9999 HOURS").collect()
    assert(out.head.getLong(0) == 0L)
    assert(LT.versions(root) == Seq(1L, 2L))
  }

  test("OPTIMIZE WHERE compacts only the matching partition; others carry verbatim; row predicates refused") {
    import spark.implicits._
    val root = freshRoot("optwhere")
    val df = (1L to 60L).map(i => (i, (i % 3).toString)).toDF("id", "k")
    LT.create(df.filter(col("id") <= 20), root, partitionBy = Seq("k"))
    LT.append(df.filter(col("id") > 20 && col("id") <= 40), root,
      partitionBy = Seq("k"))
    LT.append(df.filter(col("id") > 40), root, partitionBy = Seq("k"))
    val v = LT.currentVersion(root).get
    def byPart(ver: Long): Map[String, Seq[String]] =
      LT.manifestFiles(root, ver).groupBy(_.split('/').head).map {
        case (p, fs) => p -> fs.sorted.toSeq
      }
    val before = byPart(v)
    assert(before("k=1").size >= 3, s"fixture not fragmented: $before")
    val v2 = LT.compactWhere(spark, root, "k = '1'")
    assert(v2 == v + 1)
    val after = byPart(v2)
    // the matching partition bin-packed to one file; the others are the
    // SAME manifest entries (carried, not rewritten)
    assert(after("k=1").size == 1)
    assert(after("k=0") == before("k=0") && after("k=2") == before("k=2"))
    // content unchanged
    assert(LT.read(spark, root).select("id").as[Long].collect().sorted.toSeq
      == (1L to 60L))
    // a row predicate (non-partition column) is refused structurally
    val ex = intercept[IllegalArgumentException] {
      LT.compactWhere(spark, root, "id > 5")
    }
    assert(ex.getMessage.contains("partition columns only"))
    // SQL face
    graft.sql.GraftCatalog.register(spark, "r7_opt", root, Seq("k"))
    LT.append(Seq((100L, "1")).toDF("id", "k"), root, partitionBy = Seq("k"))
    val out = spark.sql("OPTIMIZE r7_opt WHERE k = '1'").collect()
    assert(out.head.getLong(0) == LT.currentVersion(root).get)
    assert(byPart(LT.currentVersion(root).get)("k=1").size == 1)
  }

  test("generated-partition pruning: source-range predicates prune partition dirs; declaration verified") {
    import spark.implicits._
    // div-bucketed table: bucket = floor(id / 100), 6 partition dirs
    val root = freshRoot("genpart")
    val df = (0L until 600L).map(i => (i, s"v$i")).toDF("id", "v")
      .withColumn("bucket", LT.generatedPartitionColumn("div:100", col("id")))
    LT.create(df, root, partitionBy = Seq("bucket"))
    LT.alterSetGeneratedPartition(spark, root, "bucket", "div:100", "id")
    // a range on id (bucket never mentioned) must scan only buckets 2..4
    val q = LT.read(spark, root).filter(col("id") >= 250 && col("id") <= 420)
    assert(q.count() == 171)
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("bucket"),
      s"derived bucket predicate missing from scan:\n$scan")
    val filesRead = q.queryExecution.executedPlan.collectLeaves().head match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles.toInt
      case _ => -1
    }
    val totalFiles = LT.fileCount(root, LT.currentVersion(root).get)
    assert(filesRead > 0 && filesRead < totalFiles,
      s"no pruning: read $filesRead of $totalFiles files")
    // date kind: multi-day synthetic events, filter on ts only
    val root2 = freshRoot("genpart_date")
    val ev = (0L until 240L).map { i =>
      (i, new java.sql.Timestamp(1704067200000L + i * 3600 * 1000))
    }.toDF("event_id", "ts")   // 2024-01-01 .. 2024-01-10, hourly (UTC)
      .withColumn("day", LT.generatedPartitionColumn("date", col("ts")))
    LT.create(ev, root2, partitionBy = Seq("day"))
    LT.alterSetGeneratedPartition(spark, root2, "day", "date", "ts")
    val q2 = LT.read(spark, root2)
      .filter(col("ts") >= lit("2024-01-03 06:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-05 00:00:00").cast("timestamp"))
    assert(q2.count() == 42)
    val parts2 = q2.queryExecution.executedPlan.collectLeaves().head match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
      case _ => -1
    }
    assert(parts2 == 2,
      s"date pruning should read exactly the 01-03 and 01-04 dirs, read $parts2")
    // SQL face: ALTER TABLE ... SET GENERATED routes to the same
    // declaration (fresh table, declared via SQL, then pruned the same)
    val root4 = freshRoot("genpart_sql")
    LT.create((0L until 300L).map(i => (i, s"w$i")).toDF("id", "v")
      .withColumn("bucket", LT.generatedPartitionColumn("div:100", col("id"))),
      root4, partitionBy = Seq("bucket"))
    graft.sql.GraftCatalog.register(spark, "r7_gen", root4, Seq("bucket"))
    spark.sql("ALTER TABLE r7_gen SET GENERATED bucket AS DIV(id, 100)")
    assert(LT.generatedColsAt(root4, LT.currentVersion(root4).get) ==
      Seq(("bucket", "div:100", "id")))
    val q4 = LT.read(spark, root4).filter(col("id") === 250)
    assert(q4.count() == 1)
    val parts4 = q4.queryExecution.executedPlan.collectLeaves().head match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
      case _ => -1
    }
    assert(parts4 == 1, s"equality should prune to one dir, read $parts4")
    // declaration against divergent rows is refused
    val root3 = freshRoot("genpart_bad")
    LT.create(Seq((1L, 99L)).toDF("id", "bucket"), root3,
      partitionBy = Seq("bucket"))
    val ex = intercept[IllegalArgumentException] {
      LT.alterSetGeneratedPartition(spark, root3, "bucket", "div:100", "id")
    }
    assert(ex.getMessage.contains("violate"))
  }

  test("OPTIMIZE WHERE races appends safely: lost CAS is a retryable conflict, rows never lost or doubled") {
    import spark.implicits._
    val root = freshRoot("optrace")
    LT.create((0L until 30L).map(i => (i, (i % 3).toString)).toDF("id", "k"),
      root, partitionBy = Seq("k"))
    // writer thread: 10 sequential appends (each its own CAS commit);
    // maintenance thread: compactWhere on partition k=1 in a retry loop —
    // a lost CAS surfaces as ConcurrentModificationException, the
    // documented optimistic-concurrency contract, and the retry re-reads
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      try (0 until 10).foreach { i =>
        LT.append(Seq((100L + i, (i % 3).toString)).toDF("id", "k"), root,
          partitionBy = Seq("k"))
      } catch { case t: Throwable => errs.add(t) }
    })
    val compactor = new Thread(() => {
      try (0 until 5).foreach { _ =>
        var done = false
        var tries = 0
        while (!done && tries < 20) {
          try { LT.compactWhere(spark, root, "k = '1'"); done = true }
          catch {
            case _: java.util.ConcurrentModificationException =>
              tries += 1; Thread.sleep(5)
          }
        }
        assert(done, "compactWhere starved out after 20 CAS retries")
      } catch { case t: Throwable => errs.add(t) }
    })
    appender.start(); compactor.start()
    appender.join(120000); compactor.join(120000)
    assert(errs.isEmpty, s"concurrent maintenance failed: ${errs.peek()}")
    val ids = LT.read(spark, root).select("id").as[Long].collect().sorted.toSeq
    assert(ids == ((0L until 30L) ++ (100L until 110L)).sorted,
      s"rows lost or doubled under the race: $ids")
  }

  test("enableIdentity refuses a table that already holds rows") {
    import spark.implicits._
    val root = freshRoot("ident_guard")
    LT.create(Seq((1L, "a")).toDF("k", "v"), root)
    val ex = intercept[IllegalArgumentException] {
      LT.enableIdentity(root, "id", Seq("k"))
    }
    assert(ex.getMessage.contains("empty table"))
    // an empty-seed create (zero-row part file) is still enableable
    val root2 = freshRoot("ident_ok")
    LT.create(Seq.empty[(Long, String)].toDF("k", "v"), root2)
    LT.enableIdentity(root2, "id", Seq("k"))
    LT.appendWithIdentity(spark, Seq((5L, "x")).toDF("k", "v"), root2)
    assert(LT.read(spark, root2).select("id").as[Long].collect().toSeq == Seq(1L))
  }
}
