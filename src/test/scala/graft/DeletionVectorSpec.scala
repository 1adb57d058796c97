package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read deletion vectors: delete = a position sidecar, not a
  * file rewrite ([[graft.sources.LakehouseTable.deleteWhereMor]]). */
class DeletionVectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.sources.{LakehouseTable => LT}

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/dv_$name"
    val p = java.nio.file.Paths.get(r)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    r
  }

  private def ids(root: String, v: Option[Long] = None): Seq[Long] =
    LT.read(spark, root, v).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("MOR delete removes rows without touching any data file") {
    import spark.implicits._
    val root = freshRoot("basic")
    LT.create((1L to 50L).map(i => (i, s"r$i", i % 5)).toDF("id", "v", "k"),
      root, partitionBy = Seq("k"))
    val v0 = LT.currentVersion(root).get
    val before = LT.fileCount(root, v0)
    val v1 = LT.deleteWhereMor(spark, root, "id % 10 = 0")
    assert(v1 == v0 + 1)
    // identical file list — the delete wrote only a DV sidecar
    assert(LT.fileCount(root, v1) == before)
    assert(ids(root) == (1L to 50L).filterNot(_ % 10 == 0))
    // content equals the COW sibling's result on a copy
    val root2 = freshRoot("basic_cow")
    LT.create((1L to 50L).map(i => (i, s"r$i", i % 5)).toDF("id", "v", "k"),
      root2, partitionBy = Seq("k"))
    LT.deleteWhere(spark, root2, "id % 10 = 0", partitionBy = Seq("k"))
    assert(ids(root) == ids(root2))
    // time travel to the pre-delete version still sees every row
    assert(ids(root, Some(v0)) == (1L to 50L))
  }

  test("repeated MOR deletes merge per-file DVs; filters/pushdown still correct") {
    import spark.implicits._
    val root = freshRoot("merge")
    LT.create((1L to 40L).map(i => (i, i * 2.0)).toDF("id", "x"), root)
    LT.deleteWhereMor(spark, root, "id <= 5")
    val v2 = LT.deleteWhereMor(spark, root, "id >= 38")
    assert(ids(root) == (6L to 37L))
    // exactly one DV entry per covered data file (merged, not stacked)
    val dvs = LT.dvsAt(root, v2)
    assert(dvs.map(_._1).distinct.size == dvs.size)
    // predicates on the DV-filtered frame still return exact results
    assert(LT.read(spark, root).filter("id < 10").count() == 4) // 6,7,8,9
    // a no-match delete is a no-op commit
    assert(LT.deleteWhereMor(spark, root, "id = 9999") == v2)
  }

  test("materializeDvs rewrites only covered files, clears DVs; export works at every stage") {
    import spark.implicits._
    val root = freshRoot("mat")
    LT.create((1L to 20L).map(i => (i, s"a$i")).toDF("id", "s"), root)
    LT.append((21L to 40L).map(i => (i, s"a$i")).toDF("id", "s"), root)
    val vDel = LT.deleteWhereMor(spark, root, "id IN (3, 25)")
    // the Delta mirror exports a DV-active table as spec deletionVector
    // actions; the log-only reader applies them and agrees with the
    // native read
    LT.exportDeltaLog(spark, root)
    assert(LT.readDeltaExport(spark, root).select("id")
      .as[Long].collect().sorted.toSeq ==
      (1L to 40L).filterNot(i => i == 3 || i == 25))
    val before = LT.dvsAt(root, vDel)
    assert(before.nonEmpty)
    val vMat = LT.materializeDvs(spark, root)
    assert(LT.dvsAt(root, vMat).isEmpty)
    assert(ids(root) == (1L to 40L).filterNot(i => i == 3 || i == 25))
    // export after the rewrite: same content, now DV-free
    LT.exportDeltaLog(spark, root)
    assert(LT.readDeltaExport(spark, root).select("id")
      .as[Long].collect().sorted.toSeq ==
      (1L to 40L).filterNot(i => i == 3 || i == 25))
    // a second materialize is a no-op
    assert(LT.materializeDvs(spark, root) == vMat)
  }

  test("COW rewrite and compaction of DV'd files drop their entries automatically") {
    import spark.implicits._
    val root = freshRoot("cow_drop")
    LT.create((1L to 30L).map(i => (i, i % 3)).toDF("id", "g"), root)
    LT.deleteWhereMor(spark, root, "id = 7")
    // compact reads THROUGH the DV and rewrites — entries must vanish
    val vc = LT.compact(spark, root)
    assert(LT.dvsAt(root, vc).isEmpty,
      "compaction rewrote every file; DV entries must drop with them")
    assert(ids(root) == (1L to 30L).filterNot(_ == 7))
  }

  test("RESTORE past a MOR delete un-deletes; vacuum reclaims orphaned DV files") {
    import spark.implicits._
    val root = freshRoot("restore")
    LT.create((1L to 10L).map(i => (i, i)).toDF("id", "n"), root)
    val v0 = LT.currentVersion(root).get
    LT.deleteWhereMor(spark, root, "id > 8")
    assert(ids(root) == (1L to 8L))
    val vr = LT.restore(root, v0)
    assert(LT.dvsAt(root, vr).isEmpty)
    assert(ids(root) == (1L to 10L))
    // the DV file now belongs to no retained version: vacuum removes it
    val deletesDir = java.nio.file.Paths.get(root, "deletes")
    assert(java.nio.file.Files.list(deletesDir).count() == 1)
    LT.vacuum(root, retainLast = 1)
    assert(!java.nio.file.Files.isDirectory(deletesDir) ||
      java.nio.file.Files.list(deletesDir).count() == 0)
    assert(ids(root) == (1L to 10L))
  }

  test("changeFeed surfaces MOR deletes as row-level delete events") {
    import spark.implicits._
    val root = freshRoot("cdc")
    LT.create((1L to 12L).map(i => (i, s"v$i")).toDF("id", "s"), root)
    val v0 = LT.currentVersion(root).get
    val v1 = LT.deleteWhereMor(spark, root, "id IN (2, 11)")
    val feed = LT.changeFeed(spark, root, v0, v1, keys = Seq("id"))
    val rows = feed.select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(rows == Seq(("delete", 2L), ("delete", 11L)))
    // and the incremental reader sees no phantom additions
    assert(LT.readIncremental(spark, root, v0, Some(v1)).count() == 0)
  }

  test("secondary value index: exact-membership pruning, stale-safe after append and rewrite") {
    import spark.implicits._
    val root = freshRoot("vidx")
    // 8 files ranged by id — every file's k-range overlaps (k = id % 10),
    // so stats can't prune on k; the index can
    LT.create((1L to 800L).map(i => (i, i % 10)).toDF("id", "k")
      .repartitionByRange(8, col("id")), root)
    LT.buildValueIndex(spark, root, "k")
    def lookup() = LT.readValueIndexed(spark, root, "k", 3L).filter("k = 3")
    assert(lookup().count() == 80)
    // a value in NO file: zero candidates, zero rows
    assert(LT.valueIndexCandidateCount(spark, root, "k", 99L) == 0)
    assert(LT.readValueIndexed(spark, root, "k", 99L).filter("k = 99").count() == 0)
    // stale-safe: appended rows are found without rebuilding the index,
    // at the cost of scanning only the unindexed tail
    LT.append(Seq((900L, 3L), (901L, 99L)).toDF("id", "k").coalesce(1), root)
    assert(lookup().count() == 81)
    assert(LT.readValueIndexed(spark, root, "k", 99L).filter("k = 99").count() == 1)
    val n = LT.valueIndexCandidateCount(spark, root, "k", 99L)
    assert(n == 1, s"a no-hit lookup must scan only the unindexed tail, got $n")
    // a COW rewrite replaces indexed files: their entries fall out of the
    // manifest intersection, the rewritten files are post-index → scanned
    LT.deleteWhere(spark, root, "id = 400")
    assert(lookup().count() == 81)
    // rebuild restores full pruning: k=99 resolves to exactly its one
    // file (it exists now), a truly absent value back to zero files
    LT.buildValueIndex(spark, root, "k")
    assert(LT.valueIndexCandidateCount(spark, root, "k", 99L) == 1)
    assert(LT.readValueIndexed(spark, root, "k", 99L).filter("k = 99").count() == 1)
    val after = LT.valueIndexCandidateCount(spark, root, "k", 55L)
    assert(after == 0, s"rebuilt index must prune the no-hit lookup, got $after")
  }

  test("SQL face: ENABLE DELETION VECTORS routes DELETE to MOR; REORG APPLY (PURGE) materializes") {
    import spark.implicits._
    import graft.sql.{GraftCatalog, GraftSql}
    val root = freshRoot("sql")
    GraftSql.sql(spark, "DROP TABLE IF EXISTS dv_sql_t")
    LT.create((1L to 30L).map(i => (i, i % 3)).toDF("id", "g"), root)
    GraftSql.register(spark, "dv_sql_t", root)
    GraftSql.sql(spark, "ALTER TABLE dv_sql_t ENABLE DELETION VECTORS")
    val filesBefore = LT.fileCount(root, LT.currentVersion(root).get)
    GraftSql.sql(spark, "DELETE FROM dv_sql_t WHERE id % 10 = 0")
    val v = LT.currentVersion(root).get
    assert(LT.fileCount(root, v) == filesBefore, "MOR delete must not rewrite files")
    assert(LT.dvsAt(root, v).nonEmpty)
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM dv_sql_t")
      .collect()(0).getLong(0) == 27)
    val detail = GraftSql.sql(spark, "DESCRIBE DETAIL dv_sql_t").collect()(0)
    assert(detail.getString(detail.fieldIndex("deletion_vectors"))
      .startsWith("enabled; "), detail.toString)
    // the flag survives a catalog 'restart' (persisted descriptor)
    GraftCatalog.resetInMemoryForTest()
    assert(GraftCatalog.lookup("dv_sql_t").exists(_.morDeletes))
    // Delta's purge statement clears the DVs and keeps the content
    GraftSql.sql(spark, "REORG TABLE dv_sql_t APPLY (PURGE)")
    assert(LT.dvsAt(root, LT.currentVersion(root).get).isEmpty)
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM dv_sql_t")
      .collect()(0).getLong(0) == 27)
    // DISABLE returns DELETE to copy-on-write
    GraftSql.sql(spark, "ALTER TABLE dv_sql_t DISABLE DELETION VECTORS")
    GraftSql.sql(spark, "DELETE FROM dv_sql_t WHERE id = 1")
    val v2 = LT.currentVersion(root).get
    assert(LT.dvsAt(root, v2).isEmpty, "COW delete must not create DVs")
  }

  test("shallow clone: zero-copy hardlinks, divergence, vacuum survival") {
    import spark.implicits._
    val src = freshRoot("clone_src")
    val dst = freshRoot("clone_dst")
    LT.create((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s"), src)
    LT.deleteWhereMor(spark, src, "id = 50") // DV state must travel too
    LT.cloneTable(spark, src, dst)
    assert(ids(dst) == (1L to 100L).filterNot(_ == 50))
    // zero-copy: the shared data file has two directory entries
    val aFile = java.nio.file.Paths.get(src, "data")
    val one = java.nio.file.Files.walk(aFile).filter(p =>
      p.toString.endsWith(".parquet")).findFirst().get()
    assert(java.nio.file.Files.getAttribute(one, "unix:nlink")
      .asInstanceOf[Number].intValue() >= 2, s"expected a hardlink for $one")
    // divergence: writes on one side never show on the other
    LT.append(Seq((200L, "x")).toDF("id", "s").coalesce(1), dst)
    LT.deleteWhere(spark, src, "id <= 10")
    assert(ids(dst) == ((1L to 100L).filterNot(_ == 50) :+ 200L).sorted)
    assert(ids(src) == (11L to 100L).filterNot(_ == 50))
    // vacuum on the source drops ITS name for the rewritten files; the
    // clone's links keep the bytes alive
    LT.vacuum(src, retainLast = 1)
    assert(ids(dst) == ((1L to 100L).filterNot(_ == 50) :+ 200L).sorted)
    // SQL face
    import graft.sql.{GraftCatalog, GraftSql}
    GraftSql.sql(spark, "DROP TABLE IF EXISTS clone_sql_src")
    GraftSql.sql(spark, "DROP TABLE IF EXISTS clone_sql_c")
    GraftSql.register(spark, "clone_sql_src", dst)
    val cloneRoot = freshRoot("clone_sql_c")
    GraftSql.sql(spark,
      s"CREATE TABLE clone_sql_c SHALLOW CLONE clone_sql_src LOCATION '$cloneRoot'")
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM clone_sql_c")
      .collect()(0).getLong(0) == 100)
  }

  test("graft-table stream refuses a MOR delete range unless ignoreChanges") {
    import spark.implicits._
    val root = freshRoot("stream")
    LT.create((1L to 6L).map(i => (i, i)).toDF("id", "n"), root)
    val dir = java.nio.file.Files.createTempDirectory("dv_stream_ckpt").toString
    val q = spark.readStream.format("graft-table").option("path", root).load()
      .writeStream.format("memory").queryName("dv_stream_t")
      .option("checkpointLocation", dir).start()
    try {
      q.processAllAvailable()
      assert(spark.table("dv_stream_t").count() == 6)
      LT.deleteWhereMor(spark, root, "id = 1")
      val ex = intercept[Exception] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("deletion vectors")),
        s"expected the DV refusal, got: ${msgs(ex).mkString(" | ")}")
    } finally q.stop()
  }
}
