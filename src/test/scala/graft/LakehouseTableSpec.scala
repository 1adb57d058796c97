package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LakehouseTable => LT, Tables}

class LakehouseTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshRoot(): String =
    Files.createTempDirectory("graft-lht").resolve("tbl").toString

  test("create/read roundtrip preserves data exactly") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
    LT.create(src, root)
    val back = LT.read(spark, root)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("append creates a new version; time travel reads the old one") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
    val v0 = LT.create(src.filter(col("o_orderkey") < 100), root)
    val v1 = LT.append(src.filter(col("o_orderkey") >= 100), root)
    assert(v0 == 0 && v1 == 1)
    val n0 = LT.read(spark, root, Some(0)).count()
    val n1 = LT.read(spark, root, Some(1)).count()
    assert(n0 == src.filter(col("o_orderkey") < 100).count())
    assert(n1 == src.count())
    assert(LT.versions(root) == Seq(0L, 1L))
  }

  test("compact shrinks file count without changing data") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf).repartition(8)
    LT.create(src, root)
    val before = LT.read(spark, root)
    LT.compact(spark, root, numFiles = 1)
    val after = LT.read(spark, root)
    assert(after.inputFiles.length < before.inputFiles.length)
    assert(after.inputFiles.length == 1)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
  }

  test("partitioned table recovers partition column and prunes on read") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
    LT.create(src, root, partitionBy = Seq("o_orderstatus"))
    val back = LT.read(spark, root)
    assert(back.columns.toSet == src.columns.toSet)
    val one = back.filter(col("o_orderstatus") === "F")
    assert(one.count() == src.filter(col("o_orderstatus") === "F").count())
    // partition pruning: only files under o_orderstatus=F are read
    assert(one.select(input_file_name()).distinct().collect()
      .forall(_.getString(0).contains("o_orderstatus=F")))
  }

  test("partitioned append then read spans versions without layout conflict") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
    LT.create(src.filter(col("o_orderkey") < 500), root, Seq("o_orderstatus"))
    LT.append(src.filter(col("o_orderkey") >= 500), root, Seq("o_orderstatus"))
    val back = LT.read(spark, root)
    assert(back.count() == src.count())
    assert(back.columns.toSet == src.columns.toSet)
    val compacted = LT.compact(spark, root, 1, Seq("o_orderstatus"))
    assert(compacted == 2L)
    // partitioned reads order partition columns last — realign for compare
    val aligned = LT.read(spark, root).select(src.columns.map(col).toSeq: _*)
    assert(aligned.exceptAll(src).isEmpty && src.exceptAll(aligned).isEmpty)
  }

  test("delete-where is copy-on-write and old version still has the rows") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
    LT.create(src, root)
    LT.deleteWhere(spark, root, "o_orderstatus = 'F'")
    assert(LT.read(spark, root).filter(col("o_orderstatus") === "F").count() == 0)
    assert(LT.read(spark, root, Some(0))
      .filter(col("o_orderstatus") === "F").count() > 0)
  }

  test("stats-based file skipping prunes files and preserves results") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
      .repartitionByRange(8, col("o_orderdate")) // tight per-file date ranges
    LT.create(src, root)
    LT.computeStats(spark, root, Seq("o_orderdate", "o_totalprice"))
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime * 1000.0
    val hi = java.sql.Timestamp.valueOf("1996-06-30 00:00:00").getTime * 1000.0
    val pruned = LT.readPruned(spark, root, "o_orderdate", lo, hi)
      .filter(col("o_orderdate").between(lit("1996-01-01").cast("timestamp"),
        lit("1996-06-30").cast("timestamp")))
    val full = LT.read(spark, root)
      .filter(col("o_orderdate").between(lit("1996-01-01").cast("timestamp"),
        lit("1996-06-30").cast("timestamp")))
    assert(pruned.inputFiles.length < LT.read(spark, root).inputFiles.length,
      s"expected pruning: ${pruned.inputFiles.length} files")
    assert(pruned.count() == full.count())
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("merge upserts matched keys, inserts new ones, rewrites only touched files") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf).repartitionByRange(8, col("o_orderkey"))
    LT.create(src, root)
    val before = LT.read(spark, root)
    // updates: bump totalprice on the 5 lowest keys + insert one new key
    val bumped = src.orderBy(col("o_orderkey")).limit(5)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    val fresh = src.orderBy(col("o_orderkey")).limit(1)
      .withColumn("o_orderkey", lit(999999999L))
    val v = LT.merge(spark, root, bumped.unionByName(fresh), Seq("o_orderkey"))
    assert(v == 1L)
    val after = LT.read(spark, root)
    assert(after.count() == src.count() + 1)
    // matched rows got the new price
    val lows = bumped.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val gotPrices = after.filter(col("o_orderkey").isInCollection(lows))
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wantPrices = bumped.select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotPrices == wantPrices)
    // inserted row present
    assert(after.filter(col("o_orderkey") === 999999999L).count() == 1)
    // file-pruned COW: untouched files carried over verbatim
    val carried = before.inputFiles.toSet.intersect(after.inputFiles.toSet)
    assert(carried.nonEmpty, "expected untouched files to carry over")
    assert(carried.size < before.inputFiles.length, "expected some files rewritten")
    // old version unchanged (snapshot isolation)
    assert(LT.read(spark, root, Some(0)).count() == src.count())
  }

  test("schema evolution: append with a new column widens the read schema") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
    LT.create(src.filter(col("o_orderkey") < 100), root)
    val widened = src.filter(col("o_orderkey") >= 100)
      .withColumn("o_priority_score", col("o_orderkey") % 10)
    LT.append(widened, root)
    val back = LT.read(spark, root)
    assert(back.columns.contains("o_priority_score"))
    assert(back.count() == src.count())
    // old rows read the new column as null; new rows keep their values
    assert(back.filter(col("o_orderkey") < 100)
      .filter(col("o_priority_score").isNotNull).count() == 0)
    assert(back.filter(col("o_orderkey") >= 100)
      .filter(col("o_priority_score").isNull).count() == 0)
    // time travel to v0 still sees the ORIGINAL schema
    assert(!LT.read(spark, root, Some(0)).columns.contains("o_priority_score"))
  }

  test("clustered compaction tightens file ranges so pruning skips more files") {
    val root = freshRoot()
    // random layout: every file spans the full date range -> nothing prunes
    val src = Tables.orders(spark, sf).repartition(8)
    LT.create(src, root)
    LT.computeStats(spark, root, Seq("o_orderdate"))
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime * 1000.0
    val hi = java.sql.Timestamp.valueOf("1996-06-30 00:00:00").getTime * 1000.0
    val beforeFiles = LT.readPruned(spark, root, "o_orderdate", lo, hi).inputFiles.length
    LT.cluster(spark, root, Seq("o_orderdate"), numFiles = 8)
    val prunedAfter = LT.readPruned(spark, root, "o_orderdate", lo, hi)
    assert(prunedAfter.inputFiles.length < beforeFiles,
      s"clustering should prune: $beforeFiles -> ${prunedAfter.inputFiles.length}")
    val cond = col("o_orderdate").between(
      lit("1996-01-01").cast("timestamp"), lit("1996-06-30").cast("timestamp"))
    val want = src.filter(cond)
    val got = prunedAfter.filter(cond)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("z-order clustering prunes on BOTH dimensions and loses no rows") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf).repartition(8)
    LT.create(src, root)
    LT.zorderCluster(spark, root, Seq("o_custkey", "o_totalprice"), numFiles = 8)
    val total = LT.read(spark, root).inputFiles.length
    assert(total > 1)
    // narrow slice in EACH dimension must skip files (a lexicographic sort
    // on (custkey, totalprice) would only ever prune on custkey)
    val keyMax = src.agg(max(col("o_custkey"))).head().getLong(0).toDouble
    val bothPrune = Seq(
      ("o_custkey", 0.0, keyMax * 0.1),
      ("o_totalprice", 1000.0, 50000.0)).map { case (c, lo, hi) =>
      val pruned = LT.readPruned(spark, root, c, lo, hi)
      // no false drops: pruned read must return every matching row
      val want = src.filter(col(c) >= lo && col(c) <= hi).count()
      assert(pruned.filter(col(c) >= lo && col(c) <= hi).count() == want)
      pruned.inputFiles.length < total
    }
    assert(bothPrune.forall(identity),
      s"z-order should prune on every clustered dimension")
    // layout change only: full contents identical
    val back = LT.read(spark, root)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("restore rolls back to an old version as a new commit") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
    LT.create(src, root)                                   // v0
    LT.deleteWhere(spark, root, "o_orderstatus = 'F'")     // v1
    val v = LT.restore(root, 0L)                           // v2 == v0's files
    assert(v == 2L)
    val back = LT.read(spark, root)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // the delete version is still readable (history preserved)
    assert(LT.read(spark, root, Some(1))
      .filter(col("o_orderstatus") === "F").count() == 0)
  }

  test("incremental read returns exactly the rows appended between versions") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
    val b0 = src.filter(col("o_orderkey") < 100)
    val b1 = src.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 500)
    val b2 = src.filter(col("o_orderkey") >= 500)
    LT.create(b0, root)    // v0
    LT.append(b1, root)    // v1
    LT.append(b2, root)    // v2
    val inc01 = LT.readIncremental(spark, root, 0L, Some(1L))
    assert(inc01.exceptAll(b1).isEmpty && b1.exceptAll(inc01).isEmpty)
    val inc02 = LT.readIncremental(spark, root, 0L)
    val want = b1.unionByName(b2)
    assert(inc02.exceptAll(want).isEmpty && want.exceptAll(inc02).isEmpty)
    assert(LT.readIncremental(spark, root, 2L).count() == 0)
  }

  test("footer stats scale DECIMAL min/max so pruning never drops matching rows") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
      .withColumn("price_dec", col("o_totalprice").cast("decimal(15,2)"))
    LT.create(src.repartition(4), root)
    LT.cluster(spark, root, Seq("price_dec"), numFiles = 8)
    val (lo, hi) = (50000.0, 150000.0)
    val pruned = LT.readPruned(spark, root, "price_dec", lo, hi)
      .filter(col("price_dec") >= lo && col("price_dec") <= hi)
    val full = LT.read(spark, root)
      .filter(col("price_dec") >= lo && col("price_dec") <= hi)
    // unscaled footer ints (e.g. 12345678 for 123456.78) would prune away
    // files that DO contain rows in [lo, hi] — counts must match exactly
    assert(pruned.count() == full.count() && full.count() > 0)
    // and the stats must actually prune something on a clustered layout
    assert(pruned.inputFiles.length < LT.read(spark, root).inputFiles.length)
  }

  test("txn ids are recorded and surface via lastTxn for replay detection") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
    assert(LT.lastTxn(root).isEmpty)
    LT.create(src.filter(col("o_orderkey") < 100), root, txn = Some(0L))
    LT.append(src.filter(col("o_orderkey") >= 100), root, txn = Some(1L))
    assert(LT.lastTxn(root) == Some(1L))
    // a replayed micro-batch (id <= lastTxn) is what writers skip: applying
    // the guard leaves versions and rows unchanged
    val replayedId = 1L
    if (!LT.lastTxn(root).exists(_ >= replayedId))
      LT.append(src.filter(col("o_orderkey") >= 100), root, txn = Some(replayedId))
    assert(LT.versions(root) == Seq(0L, 1L))
    assert(LT.read(spark, root).count() == src.count())
    // a manifest without txn (plain compact) does not erase the history max
    LT.compact(spark, root, numFiles = 1)
    assert(LT.lastTxn(root) == Some(1L))
  }

  test("a concurrent commit of the same version is a detected conflict, not a lost update") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf).limit(100)
    LT.create(src, root)
    // simulate the race window: another writer lands version 1 AFTER this
    // writer chose version=1 but before its manifest link lands
    val v1 = java.nio.file.Paths.get(root, "_manifest", "1.json")
    java.nio.file.Files.writeString(v1, """{"files": []}""")
    val before = java.nio.file.Files.readString(v1)
    intercept[java.util.ConcurrentModificationException] {
      LT.commit(root, 1L, Seq("some/file.parquet"))
    }
    // the competing manifest is untouched (no silent replace)
    assert(java.nio.file.Files.readString(v1) == before)
    // and a normal retry (re-reading the table) succeeds at version 2
    assert(LT.append(src, root) == 2L)
  }

  test("vacuum removes files only the dropped versions reference") {
    val root = freshRoot()
    val src = Tables.orders(spark, sf)
    LT.create(src.filter(col("o_orderkey") < 100), root)
    LT.append(src.filter(col("o_orderkey") >= 100), root)
    LT.compact(spark, root, numFiles = 1) // v2 references only new files
    val deleted = LT.vacuum(root, retainLast = 1)
    assert(deleted > 0)
    assert(LT.versions(root) == Seq(2L))
    // current version still fully readable
    assert(LT.read(spark, root).count() == src.count())
  }

  test("write expectations quarantine violating rows with the failed names") {
    val root = freshRoot()
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    LT.create(ev.filter(col("event_id") < 0), root) // empty v0, schema only
    val batch = ev.limit(200)
    val nHighValue = batch.filter(!(col("value") <= 50.0)).count()
    val (v1, nBad) = LT.appendWithExpectations(batch, root, Map(
      "value_cap" -> (col("value") <= 50.0),
      "known_type" -> col("event_type").isin("click", "view", "purchase", "signup", "error")))
    assert(v1 == 1L)
    assert(nBad == nHighValue) // every type is known, so only value_cap fires
    assert(LT.read(spark, root).count() == 200 - nBad)
    val rejects = LT.read(spark, root + "/_rejects")
    assert(rejects.count() == nBad)
    assert(rejects.select("violated").distinct().collect()
      .map(_.getString(0)).toSet == Set("value_cap"))

    // a second failing batch APPENDS to the rejects table; a row failing
    // two expectations lists both, sorted by name
    val (v2, nBad2) = LT.appendWithExpectations(
      batch.withColumn("event_type", lit("mystery")), root, Map(
        "value_cap" -> (col("value") <= 50.0),
        "known_type" -> col("event_type").isin("click", "view", "purchase", "signup", "error")))
    assert(v2 == 2L && nBad2 == 200)
    val rej2 = LT.read(spark, root + "/_rejects")
    assert(rej2.count() == nBad + 200)
    assert(rej2.filter(col("violated") === "known_type,value_cap").count() == nHighValue)

    // NULL check results pass (SQL CHECK semantics)
    val (v3, nBad3) = LT.appendWithExpectations(
      batch.withColumn("value", lit(null).cast("double")), root,
      Map("value_cap" -> (col("value") <= 50.0)))
    assert(v3 == 3L && nBad3 == 0L)
  }

  test("incremental view maintenance equals a full recompute after each sync") {
    import graft.sources.IncrementalView
    val srcRoot = freshRoot(); val aggRoot = freshRoot()
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
    // upstream batch 1 → initial full materialization
    LT.create(ev.filter(col("event_id") % 3 === 0), srcRoot)
    val v1 = IncrementalView.syncAggregate(spark, srcRoot, aggRoot, "event_type", "value")
    assert(v1 == 0L)
    // two more upstream appends, synced separately — each sync reads only
    // the delta files, never the whole source
    LT.append(ev.filter(col("event_id") % 3 === 1), srcRoot)
    IncrementalView.syncAggregate(spark, srcRoot, aggRoot, "event_type", "value")
    LT.append(ev.filter(col("event_id") % 3 === 2), srcRoot)
    val v3 = IncrementalView.syncAggregate(spark, srcRoot, aggRoot, "event_type", "value")
    assert(v3 == 2L)
    // bit-exact equality with the from-scratch aggregate (decimal sums)
    val got = LT.read(spark, aggRoot)
    val want = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(28,2)").as("sum_value"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // idempotent: nothing new upstream → no new aggregate version
    val aggV = LT.currentVersion(aggRoot)
    IncrementalView.syncAggregate(spark, srcRoot, aggRoot, "event_type", "value")
    assert(LT.currentVersion(aggRoot) == aggV)

    // upstream compaction rewrites every file: a file-level delta would
    // double-count, so the sync must detect it and recompute — totals
    // unchanged
    LT.compact(spark, srcRoot, numFiles = 1)
    LT.append(ev.limit(0), srcRoot) // another version after the rewrite
    IncrementalView.syncAggregate(spark, srcRoot, aggRoot, "event_type", "value")
    val afterCompact = LT.read(spark, aggRoot)
    assert(afterCompact.exceptAll(want).isEmpty && want.exceptAll(afterCompact).isEmpty)
  }

  test("compactSmall bin-packs only the small files and keeps big ones in place") {
    val root = freshRoot()
    val src = Tables.lineitem(spark, sf)
    // one big file, then many tiny appends (the fresh-partition pattern)
    LT.create(src.filter(col("l_orderkey") < 5000).coalesce(1), root)
    (0 until 4).foreach { i =>
      LT.append(src.filter(col("l_orderkey") >= 5000 + i * 10)
        .filter(col("l_orderkey") < 5010 + i * 10).coalesce(1), root)
    }
    val before = LT.read(spark, root)
    val beforeCount = before.count()
    val manifestBefore = LT.versions(root).last
    // big threshold picks up the tiny appends, not the big base file
    val bigFileFloor = 64L * 1024 // base file is ~hundreds of KB, appends ~KB
    val v = LT.compactSmall(spark, root, smallBytes = bigFileFloor,
      targetBytes = 1024L * 1024)
    assert(v == manifestBefore + 1)
    val after = LT.read(spark, root)
    assert(after.count() == beforeCount)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    // the 4 small files merged into 1; the big file survived untouched
    // (same relative path in both manifests)
    val sharedFiles = LT.removedFilesBetween(root, manifestBefore, v) // dropped by compact
    assert(sharedFiles.size == 4, s"expected the 4 small files rewritten, got $sharedFiles")
    // idempotent: a second pass with one remaining small file is a no-op
    assert(LT.compactSmall(spark, root, smallBytes = bigFileFloor,
      targetBytes = 1024L * 1024) == v)
  }

  test("incremental view folds NULL keys and NULL-value deltas correctly") {
    import graft.sources.IncrementalView
    val srcRoot = freshRoot(); val aggRoot = freshRoot()
    import spark.implicits._
    val b1 = Seq((Option("a"), Option(1.0)), (Option.empty[String], Option(2.0)))
      .toDF("k", "v")
    val b2 = Seq((Option.empty[String], Option(3.0)), // null key again
      (Option("a"), Option.empty[Double]),            // null value delta
      (Option("b"), Option.empty[Double]))            // never a non-null value
    .toDF("k", "v")
    LT.create(b1, srcRoot)
    IncrementalView.syncAggregate(spark, srcRoot, aggRoot, "k", "v")
    LT.append(b2, srcRoot)
    IncrementalView.syncAggregate(spark, srcRoot, aggRoot, "k", "v")
    val got = LT.read(spark, aggRoot)
    // exactly one NULL-key row, folded across both syncs
    assert(got.filter(col("k").isNull).count() == 1)
    val nullRow = got.filter(col("k").isNull).collect()(0)
    assert(nullRow.getAs[Long]("n") == 2L)
    assert(nullRow.getDecimal(2).doubleValue() == 5.0)
    // a's sum survives an all-NULL delta; b's sum is NULL like a recompute
    val a = got.filter(col("k") === "a").collect()(0)
    assert(a.getAs[Long]("n") == 2L && a.getDecimal(2).doubleValue() == 1.0)
    val b = got.filter(col("k") === "b").collect()(0)
    assert(b.getAs[Long]("n") == 1L && b.isNullAt(2))
  }
}
