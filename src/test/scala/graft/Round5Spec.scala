package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Targeted properties of the round-5 changes. */
class Round5Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q68: repeated invocations hold persisted-RDD count flat (no GC-coupled accretion)") {
    // The round-4 design cut lineage with localCheckpoint, whose blocks
    // the ContextCleaner frees only when the JVM GC collects the internal
    // RDD handle — on a 16 GiB heap (rare minor GCs) repeated runs in one
    // session accreted blocks and read 5x slow (PLANS.md forensics,
    // 2.7 s → 14.8 s). Round 5 replaces it with an explicit handoff: each
    // invocation releases the previous one's frames FIRST, so the live
    // persisted-RDD count must be identical after run 2 and after run 10
    // regardless of heap size or GC schedule. No System.gc() anywhere —
    // that would re-hide the coupling this test exists to catch.
    val q = SparkEntry.queries("q68_dup_clusters")
    def persistedCount: Int = spark.sparkContext.getPersistentRDDs.size
    q(spark, sf).count() // run 1: long-lived RelationCache entries build
    q(spark, sf).count() // run 2: steady state (prev invocation released)
    val steady = persistedCount
    var i = 0
    while (i < 8) { q(spark, sf).count(); i += 1 }
    val after = persistedCount
    // growth is the failure mode (GC-coupled accretion); a DOWNWARD drift
    // is legal — suites share the session, and another suite's async
    // unpersist/ContextCleaner release can land mid-loop
    assert(after <= steady,
      s"persisted RDDs grew across q68 invocations: $steady -> $after")
    // and the query still returns its clusters
    assert(q(spark, sf).count() > 0)
  }

  test("q136: the corpus is scanned exactly once (shared shingle frame is cached)") {
    // Both the train-gram branch and the test-window branch must read the
    // materialized (doc, shingle-array) relation — two parquet scans of
    // `documents` in the physical plan means the cache regressed and the
    // corpus is tokenized twice (the round-4 flagged scale cost).
    val df = SparkEntry.queries("q136_split_leakage")(spark, sf)
    df.count() // populate the RelationCache entry
    // count LEAF relations of the optimized plan: tree collect does not
    // descend into an InMemoryRelation's stored child plan, so a file
    // relation counted here is one the query would actually re-scan
    val lp = df.queryExecution.optimizedPlan
    val fileRels = lp.collect {
      case l if l.getClass.getSimpleName.startsWith("LogicalRelation") => l
    }.size
    val inMem = lp.collect {
      case m if m.getClass.getSimpleName == "InMemoryRelation" => m
    }.size
    assert(fileRels == 0,
      s"q136 still reads $fileRels file relation(s) outside the cache:\n$lp")
    assert(inMem >= 2, s"expected both branches on the cached relation:\n$lp")
  }

  test("catalog: a table registered in one 'process' resolves by name in a fresh one") {
    import graft.sql.{GraftCatalog, GraftSql}
    val root = sources.TableCache.baseDir + "/round5_catalog_t"
    GraftSql.sql(spark, s"DROP TABLE IF EXISTS round5_cat") // clean rerun
    if (sources.LakehouseTable.versions(root).isEmpty) {
      sources.Tables.registerAll(spark, sf)
      GraftSql.sql(spark,
        s"""CREATE TABLE round5_cat USING graft LOCATION '$root' AS
            SELECT r_regionkey, r_name FROM region""")
    } else GraftSql.register(spark, "round5_cat", root)
    // simulate a restarted driver: wipe ALL in-memory catalog state, then
    // query by name in a brand-new session — resolution must come from
    // the on-disk catalog descriptors alone, with no re-registration
    GraftCatalog.resetInMemoryForTest()
    val fresh = spark.newSession()
    val n = GraftSql.sql(fresh,
      "SELECT count(*) AS n FROM round5_cat").collect()(0).getLong(0)
    assert(n == sources.Tables.region(spark, sf).count())
    // and the persistent listing knows it
    val listed = GraftSql.sql(fresh, "SHOW GRAFT TABLES")
      .collect().map(_.getString(0))
    assert(listed.contains("round5_cat"), listed.mkString(","))
    // CHECK constraints survive the restart too (base64 in the
    // descriptor → parsed back on load) and still ENFORCE in the fresh
    // process: the quarantine path must fire, not a plain append
    if (GraftCatalog.lookup("round5_cat").exists(_.constraints.isEmpty))
      GraftSql.sql(fresh,
        "ALTER TABLE round5_cat ADD CONSTRAINT key_small CHECK (r_regionkey < 100)")
    GraftCatalog.resetInMemoryForTest()
    val fresh2 = spark.newSession()
    assert(GraftCatalog.lookup("round5_cat")
      .exists(_.constraints.exists(_._1 == "key_small")))
    sources.Tables.registerAll(fresh2, sf)
    val before = GraftSql.sql(fresh2,
      "SELECT count(*) AS n FROM round5_cat").collect()(0).getLong(0)
    GraftSql.sql(fresh2,
      """INSERT INTO round5_cat
         SELECT r_regionkey + 1000, r_name FROM region WHERE r_regionkey = 0""")
    val after = GraftSql.sql(fresh2,
      "SELECT count(*) AS n FROM round5_cat").collect()(0).getLong(0)
    assert(after == before, "violating insert must quarantine, not append")
    assert(sources.LakehouseTable.read(fresh2, s"$root/_rejects").count() >= 1)
  }

  test("ALTER ADD COLUMNS: schema is an epoch of the version history") {
    import graft.sources.LakehouseTable
    val root = operators.Lakehouse.ordersAlterRoot(spark, sf)
    // v0 predates the ALTER: no prio/bonus anywhere
    val v0 = LakehouseTable.read(spark, root, Some(0L))
    assert(!v0.columns.contains("prio") && !v0.columns.contains("bonus"))
    // v1 is the metadata-only ALTER: columns exist, same rows, all NULL
    val v1 = LakehouseTable.read(spark, root, Some(1L))
    assert(v1.columns.contains("prio") && v1.columns.contains("bonus"))
    assert(v1.count() == v0.count())
    assert(v1.filter(col("prio").isNotNull || col("bonus").isNotNull).count() == 0)
    // RESTORE to v0 must drop the added columns (schema restored too),
    // on a scratch copy so the shared builder table is untouched
    val scratch = sources.TableCache.baseDir +
      s"/round5_alter_restore_${java.util.UUID.randomUUID().toString.take(8)}"
    LakehouseTable.create(v0.limit(5), scratch)
    LakehouseTable.alterAddColumns(scratch, "extra_r5 BIGINT")
    assert(LakehouseTable.read(spark, scratch).columns.contains("extra_r5"))
    LakehouseTable.restore(scratch, 0L)
    assert(!LakehouseTable.read(spark, scratch).columns.contains("extra_r5"),
      "RESTORE to a pre-ALTER version must restore the pre-ALTER schema")
  }

  test("IVF cell table: a cell probe is a partition-pruned file scan") {
    import graft.sources.LakehouseTable
    val root = operators.Similarity.ivfCellTableRoot(spark, sf)
    val cells = LakehouseTable.read(spark, root)
    // the cell table is hive-partitioned by cid with one file per cell
    val nCells = cells.select(col("cid")).distinct().count()
    assert(nCells > 1, "need multiple cells for pruning to mean anything")
    // static probe: filtering one cell must read ONLY that cell's
    // partition directory — the at-scale claim that a probe scans 1/k of
    // the corpus files, enforced at the file level
    val probed = cells.filter(col("cid").cast("long") === 3L)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(probed.nonEmpty)
    assert(probed.forall(_.contains("cid=3")),
      s"probe read outside its partition: ${probed.mkString(", ")}")
    // dynamic probe (q37's shape): the query cell comes from a broadcast
    // lookup, so the big-side scan must carry a dynamic-partition-pruning
    // filter — at scale this is what turns the probe into one cell scan
    // even when the cell id is only known at runtime
    val q37 = SparkEntry.queries("q37_ivf_ann")(spark, sf)
    q37.count()
    val plan = q37.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"q37's probe scan lost dynamic partition pruning:\n$plan")
  }

  test("IVF index maintenance: appended vectors land in their exact cells") {
    import graft.sources.LakehouseTable
    // seed a scratch index with 80% of the shared index's rows, then
    // append the held-out 20% through the maintenance path — every
    // appended vector must receive the SAME cell the full build gave it,
    // and the probe path must keep pruning to single partitions
    val shared = operators.Similarity.ivfCellTableRoot(spark, sf)
    val full = LakehouseTable.read(spark, shared)
      .select(col("vec_id"), col("embedding"), col("cid").cast("long").as("cid"))
    val scratch = sources.TableCache.baseDir +
      s"/round5_ivf_maint_${java.util.UUID.randomUUID().toString.take(8)}"
    LakehouseTable.create(
      full.filter(col("vec_id") % 5 =!= 0).repartition(col("cid")),
      scratch, partitionBy = Seq("cid"))
    val held = full.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding"))
    operators.Similarity.appendToCellIndex(spark, sf, scratch, held)
    val after = LakehouseTable.read(spark, scratch)
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
    assert(after.count() == full.count())
    // cell agreement with the full build, row for row
    val disagree = after.join(full.select(col("vec_id"), col("cid").as("want")), "vec_id")
      .filter(col("cid") =!= col("want")).count()
    assert(disagree == 0, s"$disagree vectors routed to a different cell")
    // pruning still holds through the appended files
    val probed = LakehouseTable.read(spark, scratch)
      .filter(col("cid").cast("long") === 3L)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(probed.nonEmpty && probed.forall(_.contains("cid=3")))
  }

  test("partition evolution: overwrite re-layouts, old versions keep their layout") {
    import graft.sources.LakehouseTable
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-partevo").resolve("t").toString
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "k", "v")
    LakehouseTable.create(df, root) // v0: flat layout
    assert(LakehouseTable.partitionColumns(root).isEmpty)
    // v1: same rows, re-laid-out hive-partitioned by k (Iceberg-style
    // partition evolution via snapshot replace)
    LakehouseTable.overwrite(
      LakehouseTable.read(spark, root).repartition(col("k")), root,
      partitionBy = Seq("k"))
    assert(LakehouseTable.partitionColumns(root) == Seq("k"))
    // the new layout prunes at the file level
    val probed = LakehouseTable.read(spark, root)
      .filter(col("k") === "a").select(input_file_name())
      .distinct().collect().map(_.getString(0))
    assert(probed.nonEmpty && probed.forall(_.contains("k=a")),
      s"probe read outside its partition: ${probed.mkString(", ")}")
    // contents unchanged; the pre-evolution version still reads flat
    assert(LakehouseTable.read(spark, root)
      .agg(sum($"v")).head().getDouble(0) == 6.0)
    assert(LakehouseTable.read(spark, root, Some(0L)).count() == 3)
    assert(LakehouseTable.read(spark, root, Some(0L))
      .inputFiles.forall(!_.contains("k=")))
  }

  test("the delta-log reader decodes percent-encoded paths (foreign-writer logs)") {
    import spark.implicits._
    // hand-write a "foreign" Delta log whose add path is percent-encoded
    // (the spec says paths are RFC 2396 URIs) over a data file whose real
    // name contains a space
    val root = java.nio.file.Files.createTempDirectory("graft-foreign-delta")
    val dataDir = root.resolve("data")
    java.nio.file.Files.createDirectories(dataDir)
    val tmp = root.resolve("w")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .coalesce(1).write.parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp)
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part, dataDir.resolve("part a.parquet"))
    val logDir = root.resolve("_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    java.nio.file.Files.writeString(logDir.resolve(f"${0L}%020d.json"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        """{"add":{"path":"data/part%20a.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""" + "\n")
    val got = graft.sources.LakehouseTable.readDeltaExport(spark, root.toString)
    assert(got.count() == 2 &&
      got.agg(sum($"v")).head().getDouble(0) == 30.0)
  }

  test("delta checkpoint seeds the reader: pre-checkpoint JSON logs are not needed") {
    import graft.sources.LakehouseTable
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-ckpt").resolve("t").toString
    val df = (1L to 30L).map(i => (i, i * 2.0)).toDF("id", "v")
    LakehouseTable.create(df.filter($"id" % 3 === 0), root)
    LakehouseTable.append(df.filter($"id" % 3 === 1), root)
    LakehouseTable.deleteWhere(spark, root, "id < 10")
    LakehouseTable.exportDeltaLog(spark, root)
    LakehouseTable.exportDeltaCheckpoint(spark, root, 1L)
    val want = LakehouseTable.read(spark, root)
      .agg(count(lit(1)), sum($"id")).head()
    // remove every JSON log the checkpoint covers — a reader that replays
    // from version 0 instead of seeding from the checkpoint now breaks
    val logDir = java.nio.file.Paths.get(root, "_delta_log")
    java.nio.file.Files.delete(logDir.resolve(f"${0L}%020d.json"))
    java.nio.file.Files.delete(logDir.resolve(f"${1L}%020d.json"))
    val got = LakehouseTable.readDeltaExport(spark, root)
      .agg(count(lit(1)), sum($"id")).head()
    assert(got == want, s"checkpoint-seeded read diverged: $got vs $want")
  }
}
