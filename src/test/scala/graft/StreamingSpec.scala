package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Streaming twins must agree with their oracle-checked batch forms when a
  * bounded input is fully processed (no late data → watermark irrelevant). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** File-source streams need a directory; stage the single parquet file. */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-events-stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def runToCompletion(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming tumbling-hour rows EQUAL the oracled q38 batch rows") {
    // full row-set equality with the driver-verified batch query — every
    // column including the decimal-exact money sum, not a count proxy
    val got = runToCompletion(
      Streams.tumblingHourly(Streams.eventsStream(spark, streamDir)), "t_tumble",
      mode = "complete")
    val want = SparkEntry.queries("q38_tumbling_hourly")(spark, sf)
      .select(got.columns.map(col).toSeq: _*)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming session-window rows EQUAL the oracled q40 batch rows") {
    val got = runToCompletion(
      Streams.sessionWindows(Streams.eventsStream(spark, streamDir)), "t_sess",
      mode = "complete")
      // session_window end = last event time + gap; q40's session_end is
      // max(ts) — align the convention, then require exact row equality
      .select(col("user_id"), col("session_start"),
        (col("session_end") - expr("INTERVAL 30 MINUTES")).as("session_end"),
        col("n_events"), col("sum_value"))
    val want = SparkEntry.queries("q40_sessionize")(spark, sf)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming history replay rows EQUAL the oracled q24 batch rows") {
    import spark.implicits._
    val evts = Streams.eventsStream(spark, streamDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[Streams.Evt]
    val got = runToCompletion(
      Streams.historyReplay(evts, withTimeout = false).toDF(), "t_hist")
      .select(col("user_id"), col("event_id"), col("event_type"), col("history"))
    val want = SparkEntry.queries("q24_history_replay")(spark, sf)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming anomaly alerts flag exactly the batch MAD outliers") {
    val batchStats = SparkEntry.queries("q95_mad_outliers")(spark, sf)
    val thresholds = batchStats.select(col("event_type"), col("med"), col("mad"))
    val alerts = runToCompletion(
      Streams.anomalyAlerts(Streams.eventsStream(spark, streamDir), thresholds),
      "t_alerts")
    val wantN = batchStats.agg(sum(col("n_outliers"))).collect()(0).getLong(0)
    assert(alerts.count() == wantN)
    // the flagged ids are exactly the batch-flagged set
    val ev = graft.sources.Tables.events(spark, sf)
    val wantIds = ev.join(thresholds, "event_type")
      .filter(abs(col("value") - col("med")) > lit(3.0) * col("mad"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val gotIds = alerts.select("event_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == wantIds)
  }

  test("streaming EWMA rows are BIT-IDENTICAL to the oracled q126 batch rows") {
    import spark.implicits._
    val evts = Streams.eventsStream(spark, streamDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[Streams.EwmaEvt]
    val got = runToCompletion(Streams.ewmaStream(evts).toDF(), "t_ewma")
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), col("value"), col("ewma"))
    val want = SparkEntry.queries("q126_ewma")(spark, sf)
    assert(got.count() > 0 && got.count() == want.count())
    // exact doubles: the integer weight arithmetic makes stream == batch
    // bitwise, so plain exceptAll (no tolerance) is the assertion
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming dedup keeps one row per (user, type) like batch q31") {
    val got = runToCompletion(
      Streams.dedupStream(Streams.eventsStream(spark, streamDir)), "t_dedup")
    val want = SparkEntry.queries("q31_exact_dedup")(spark, sf)
    assert(got.count() == want.count())
    assert(got.select("user_id", "event_type").exceptAll(
      want.select("user_id", "event_type")).isEmpty)
  }

  test("streaming decontamination matches the batch q88 flagged set exactly") {
    // stage the documents parquet as a file-source stream
    val docDir = Files.createTempDirectory("graft-docs-stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      docDir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val docSchema = graft.sources.Tables.documents(spark, sf).schema
    val docStream = spark.readStream.schema(docSchema).parquet(docDir.toString)
      .select(col("doc_id"), col("text"))
    val benchGramsDf = spark.read.json(graft.operators.Ingest.BenchmarkFixture)
      .select(explode(graft.plans.TextExpressions.wordShingles(col("prompt"), 3))
        .as("shingle")).distinct()
    val benchGrams = benchGramsDf.collect().map(_.getString(0)).toSeq
    val flagged = SparkEntry.queries("q88_decontaminate")(spark, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // stateless filter: clean output = corpus minus the flagged set
    val clean = runToCompletion(
      Streams.decontaminateStream(docStream, benchGrams), "t_decon")
    val all = graft.sources.Tables.documents(spark, sf).count()
    assert(clean.count() == all - flagged.size)
    assert(clean.collect().forall(r => !flagged.contains(r.getAs[Long]("doc_id"))))
    // stream-static join: distinct hit doc_ids = exactly the flagged set
    val hits = runToCompletion(
      Streams.contaminationHits(docStream, benchGramsDf), "t_hits")
    assert(hits.select("doc_id").distinct().collect()
      .map(_.getAs[Long]("doc_id")).toSet == flagged)
  }

  test("streaming quality sampler keeps exactly the batch q132 accept counts") {
    val docDir = Files.createTempDirectory("graft-docs-qsample")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      docDir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val docSchema = graft.sources.Tables.documents(spark, sf).schema
    val docStream = spark.readStream.schema(docSchema).parquet(docDir.toString)
    val kept = runToCompletion(Streams.qualitySampleStream(docStream), "t_qsample")
    // per-lang stream accept counts == the oracled batch q132 n_kept
    val want = SparkEntry.queries("q132_quality_sample")(spark, sf)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_kept")).toMap
    val got = kept.groupBy(col("lang")).count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(got == want.filter(_._2 > 0))
    // and the kept ID SET is the batch predicate's set (pure function of id)
    // INDEPENDENT re-derivation of the accept predicate, deliberately NOT
    // Pipelines.qualityAccept: stream, batch query, and this spec must
    // not all share one definition or the equality becomes tautological —
    // this inline form is what pins the contract if the helper drifts
    val batchIds = graft.sources.Tables.documents(spark, sf)
      .filter(size(graft.plans.TextExpressions.tokens(col("text"))) > 0)
      .filter(graft.functions.TextFunctions.md5Prefix(col("doc_id").cast("string"), 4)
        < floor(graft.plans.TextExpressions.qualityScore(col("text")) * lit(65536)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == batchIds)
  }

  test("streaming distinct-user sketch tracks batch exact counts within HLL error") {
    // update mode (not complete): the watermark can actually evict window
    // state — the bounded-state contract the operator documents. One input
    // file → one micro-batch → each window emitted exactly once.
    val got = runToCompletion(
      Streams.distinctUsersHourly(Streams.eventsStream(spark, streamDir)), "t_du",
      mode = "update").collect()
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val e = exact(r.getTimestamp(0)).toDouble
      val a = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(a - e) / e < 0.1, s"hour ${r.get(0)}: approx $a vs exact $e")
    }
  }

  test("watermark drops late data and finalized windows emit once") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Double)](spark, 1)
    val agg = ms.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("t_late").start()

    ms.addData((t("2024-01-01 10:00:00"), 1.0), (t("2024-01-01 10:30:00"), 1.0))
    q.processAllAvailable() // watermark -> 10:20; nothing finalized
    assert(spark.table("t_late").count() == 0)

    ms.addData((t("2024-01-01 12:30:00"), 1.0))
    q.processAllAvailable() // watermark -> 12:20; 10:00 window finalized n=2
    val after2 = spark.table("t_late").collect()
    assert(after2.map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet ==
      Set(("2024-01-01 10:00:00.0", 2L)))

    // LATE: 10:45 is far behind the 12:20 watermark -> dropped entirely
    ms.addData((t("2024-01-01 10:45:00"), 1.0))
    ms.addData((t("2024-01-01 14:00:00"), 1.0))
    q.processAllAvailable() // 12:00 window finalizes with n=1, late row gone
    q.stop()
    val fin = spark.table("t_late").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
    assert(fin == Set(("2024-01-01 10:00:00.0", 2L), ("2024-01-01 12:00:00.0", 1L)),
      s"got $fin")
  }

  test("streaming ingestion commits one lakehouse version per micro-batch") {
    val base = java.nio.file.Files.createTempDirectory("graft-ingest")
    val root = base.resolve("events_tbl").toString
    val q = Streams.ingestInto(Streams.eventsStream(spark, streamDir), root,
      base.resolve("ckpt").toString)
    q.processAllAvailable(); q.stop()
    val versions = graft.sources.LakehouseTable.versions(root)
    assert(versions.nonEmpty)
    val rows = graft.sources.LakehouseTable.read(spark, root).count()
    assert(rows == graft.sources.Tables.events(spark, sf).count())
  }

  test("streaming vector ingest lands cell-identical to a batch index append, exactly once") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT, TableCache}
    val shared = graft.operators.Similarity.ivfCellTableRoot(spark, sf)
    val scratch = TableCache.baseDir +
      s"/stream_ivf_${java.util.UUID.randomUUID().toString.take(8)}"
    LT.cloneTable(spark, shared, scratch)
    val before = LT.read(spark, scratch).count()
    // four fresh vectors = existing embeddings under new ids (cell
    // routing only sees the vector, so expected cells are known exactly)
    val fresh = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 4)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])](spark, 1)
    val base = java.nio.file.Files.createTempDirectory("graft-vec-ingest")
    val q = Streams.ingestVectorsInto(
      ms.toDF().toDF("vec_id", "embedding"), sf, scratch,
      base.resolve("ckpt").toString)
    ms.addData(fresh.take(2)); q.processAllAvailable()
    ms.addData(fresh.drop(2)); q.processAllAvailable()
    q.stop()
    val streamed = LT.read(spark, scratch)
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
    assert(streamed.count() == before + 4)
    // cells equal the batch maintenance path's assignment for the SAME
    // vectors — the streamed index is probe-identical to a batch append
    val batchRoot = TableCache.baseDir +
      s"/stream_ivf_b_${java.util.UUID.randomUUID().toString.take(8)}"
    LT.cloneTable(spark, shared, batchRoot)
    graft.operators.Similarity.appendToCellIndex(spark, sf, batchRoot,
      fresh.toDF("vec_id", "embedding"))
    val batchCells = LT.read(spark, batchRoot)
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
    assert(streamed.filter(col("vec_id") >= 100000L).collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet ==
      batchCells.filter(col("vec_id") >= 100000L).collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet)
  }

  test("streaming expectations quarantine violators and stay exact across a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-ingest-exp")
    val root = base.resolve("events_tbl").toString
    val ckpt = base.resolve("ckpt").toString
    val exps = Map("value_le_100" -> (col("value") <= 100.0))
    val q = Streams.ingestIntoWithExpectations(
      Streams.eventsStream(spark, streamDir), root, exps, ckpt)
    q.processAllAvailable(); q.stop()
    val ev = graft.sources.Tables.events(spark, sf)
    val wantBad = ev.filter(!(col("value") <= 100.0)).count()
    val wantGood = ev.count() - wantBad
    assert(wantBad > 0, "fixture must contain violating rows")
    assert(graft.sources.LakehouseTable.read(spark, root).count() == wantGood)
    val rej = graft.sources.LakehouseTable.read(spark, s"$root/_rejects")
    assert(rej.count() == wantBad)
    assert(rej.select("violated").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("value_le_100"))
    // restart with the SAME checkpoint: replayed batches must change nothing
    val q2 = Streams.ingestIntoWithExpectations(
      Streams.eventsStream(spark, streamDir), root, exps, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(graft.sources.LakehouseTable.read(spark, root).count() == wantGood)
    assert(graft.sources.LakehouseTable.read(spark, s"$root/_rejects").count() == wantBad)
  }

  test("a change-feed follower tracks a streamed source through a rewrite") {
    import graft.sources.{LakehouseTable, TableSync}
    val base = Files.createTempDirectory("graft-follow")
    val src = base.resolve("src").toString
    val dst = base.resolve("dst").toString
    // stream the corpus into the source table (effectively-once ingest)
    val q = Streams.ingestInto(Streams.eventsStream(spark, streamDir), src,
      base.resolve("ckpt").toString)
    q.processAllAvailable(); q.stop()
    assert(TableSync.applyChanges(spark, src, dst, Seq("event_id"))._2 ==
      TableSync.Mode.Created)
    // then the source gets REWRITTEN: merge doubles one slice's values,
    // delete drops another — the follower must catch up via the feed
    val ev = LakehouseTable.read(spark, src)
    LakehouseTable.merge(spark, src,
      ev.filter(col("event_id") % 5 === 0).withColumn("value", col("value") * 2),
      Seq("event_id"))
    LakehouseTable.deleteWhere(spark, src, "event_id % 3 = 0")
    val (_, mode) = TableSync.applyChanges(spark, src, dst, Seq("event_id"))
    assert(mode == TableSync.Mode.Applied)
    val s = LakehouseTable.read(spark, src)
    val d = LakehouseTable.read(spark, dst).select(s.columns.map(col).toSeq: _*)
    assert(s.exceptAll(d).isEmpty && d.exceptAll(s).isEmpty)
    assert(s.count() > 0 && s.filter(col("event_id") % 3 === 0).count() == 0)
  }

  test("medallion ingest keeps the silver rollup equal to a bronze recompute") {
    val base = java.nio.file.Files.createTempDirectory("graft-medallion")
    val bronze = base.resolve("bronze").toString
    val silver = base.resolve("silver").toString
    val ckpt = base.resolve("ckpt").toString
    def stageAs(df: org.apache.spark.sql.DataFrame, inDir: java.nio.file.Path,
        name: String): Unit = {
      val tmp = inDir.resolve(name + "-tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val s = java.nio.file.Files.list(tmp)
      val part = try s.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
        finally s.close()
      java.nio.file.Files.move(part, inDir.resolve(name))
    }
    // stage raw parquet rows as-is (whatever physical ts layout the
    // generator produced) — eventsStream probes the footer schema and
    // normalizes ts on read, so the staged files must just match the source
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val inDir = java.nio.file.Files.createTempDirectory("graft-medallion-in")
    val ev = graft.sources.Tables.events(spark, sf)
    stageAs(raw.filter(col("event_id") % 2 === 0), inDir, "part-a.parquet")
    val q1 = Streams.medallionIngest(Streams.eventsStream(spark, inDir.toString),
      bronze, silver, "event_type", "value", ckpt)
    q1.processAllAvailable(); q1.stop()
    // second file lands later; SAME checkpoint → the restarted query
    // resumes batch numbering and processes only the new file
    stageAs(raw.filter(col("event_id") % 2 === 1), inDir, "part-b.parquet")
    val q2 = Streams.medallionIngest(Streams.eventsStream(spark, inDir.toString),
      bronze, silver, "event_type", "value", ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(graft.sources.LakehouseTable.read(spark, bronze).count() == ev.count())
    val got = graft.sources.LakehouseTable.read(spark, silver)
    val want = graft.sources.LakehouseTable.read(spark, bronze)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(28,2)").as("sum_value"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // silver advanced incrementally: more than one version committed
    assert(graft.sources.LakehouseTable.versions(silver).size >= 2)
  }

  test("stream-stream LEFT OUTER join flushes unmatched clicks after the watermark") {
    import spark.implicits._
    // fresh input dir: the real events + two far-future sentinel events
    // (one per side — the global watermark is the MIN across operators,
    // so BOTH the click and purchase watermark must move past every real
    // click's join horizon before unmatched rows may flush)
    val inDir = Files.createTempDirectory("graft-ssjoin-outer")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      inDir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    // sentinel ts must land in the SAME physical layout as the copied
    // file (mixed int64/timestamp footers would fracture the stream's
    // probed schema), so compute it in event time and lower it per-layout
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val maxTs = graft.sources.Tables.events(spark, sf)
      .agg(max(col("ts"))).head().getTimestamp(0)
    val h = 3600L * 1000 // one hour of millis
    val sentinels = Seq(
      (900001L, new java.sql.Timestamp(maxTs.getTime + 10 * h), 999999L, "click", 0.0, "{}"),
      (900002L, new java.sql.Timestamp(maxTs.getTime + 20 * h), 999999L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => unix_micros(col("ts")) * 1000L
        case dt                                  => col("ts").cast(dt)
      })
    val tmp = inDir.resolve("sentinel-tmp")
    sentinels.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val s0 = Files.list(tmp)
    val part = try s0.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      finally s0.close()
    Files.move(part, inDir.resolve("part-1.parquet"))

    val got = runToCompletion(
      Streams.clickPurchaseJoin(Streams.eventsStream(spark, inDir.toString),
        "leftOuter"), "t_ssjoin_outer")
      .filter(col("user_id") =!= 999999L)
    val ev = graft.sources.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val want = clicks.join(purchases,
      clicks("user_id") === purchases("user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
      "left")
      .select(clicks("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
    // the outer rows (null purchase) are the point: every unmatched real
    // click must have flushed, making stream == batch left join exactly
    assert(got.filter(col("purchase_id").isNull).count() > 0)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("stream-stream click->purchase join matches the batch join") {
    val got = runToCompletion(
      Streams.clickPurchaseJoin(Streams.eventsStream(spark, streamDir)), "t_ssjoin")
    val ev = graft.sources.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val want = clicks.join(purchases, "user_id")
      .filter(col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming upsert merges each micro-batch into the lakehouse table") {
    import spark.implicits._
    val upsertBase = java.nio.file.Files.createTempDirectory("graft-upsert")
    val root = upsertBase.resolve("kv_tbl").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark, 1)
    val q = Streams.upsertInto(ms.toDF().toDF("k", "v"), root, Seq("k"),
      upsertBase.resolve("ckpt").toString)
    ms.addData((1L, "a"), (2L, "b"), (3L, "c"))
    q.processAllAvailable()
    ms.addData((2L, "B2"), (4L, "d")) // update key 2, insert key 4
    q.processAllAvailable()
    q.stop()
    val got = graft.sources.LakehouseTable.read(spark, root)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d"))
    // two batches -> two committed versions, and v0 still has the old value
    assert(graft.sources.LakehouseTable.versions(root) == Seq(0L, 1L))
    val v0 = graft.sources.LakehouseTable.read(spark, root, Some(0))
      .as[(Long, String)].collect().toMap
    assert(v0 == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("stateful history replay matches the batch window form") {
    import spark.implicits._
    val evts = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[Streams.Evt]
    // drive through the streaming function in one batch via a memory stream
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Evt](
      spark, 1)
    ms.addData(evts.collect().toSeq)
    val q = Streams.historyReplay(ms.toDS(), withTimeout = false)
      .writeStream.outputMode("append").format("memory").queryName("t_hist").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_hist").select("user_id", "event_id", "history")
    val want = SparkEntry.queries("q24_history_replay")(spark, sf)
      .select("user_id", "event_id", "history")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("history replay gives a late cross-batch arrival its event-time history") {
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Evt](
      spark, 1)
    val q = Streams.historyReplay(ms.toDS(), withTimeout = false)
      .writeStream.outputMode("append").format("memory").queryName("t_late_hist").start()
    // batch 1: events at ts 100 and 300; batch 2: LATE event at ts 200
    ms.addData(Streams.Evt(1L, 7L, "a", 100L), Streams.Evt(3L, 7L, "c", 300L))
    q.processAllAvailable()
    ms.addData(Streams.Evt(2L, 7L, "b", 200L))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("t_late_hist").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("history")).toMap
    // the late event sees only events BEFORE ts=200 — not event 3
    assert(rows(2L) == "a", s"late event history was '${rows(2L)}'")
    assert(rows(1L) == "" && rows(3L) == "a")
  }

  test("graft-table source tails manifest versions: stream ≡ readIncremental per range") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("graft-table-src")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    // foreachBatch sink (checkpoint-recoverable, unlike memory) recording
    // every delivered (id, v) — the observable row multiset
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def stream() = spark.readStream
      .format("graft-table").option("path", root).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((r.getLong(0), r.getString(1)))); ()
      }.start()
    val q = stream()
    q.processAllAvailable()
    // batch 0 = the v0 snapshot
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == Set((1L, "a"), (2L, "b")))
    // two commits while running → tailed as deltas, row set = snapshot +
    // exactly the incremental reads over (0,2]
    LT.append(Seq((3L, "c")).toDF("id", "v"), root)
    q.processAllAvailable()
    LT.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), root)
    q.processAllAvailable()
    val incremental = LT.read(spark, root, Some(0L)).as[(Long, String)].collect().toSet ++
      LT.readIncremental(spark, root, 0L, Some(2L)).as[(Long, String)].collect().toSet
    assert(seen.asScala.toSet == incremental && seen.size == 5,
      s"streamed ${seen.asScala.toSet} != incremental $incremental")
    q.stop()
    // RESTART from the checkpoint: a commit made while the query was DOWN
    // arrives exactly once, nothing replays (seen would exceed 6 rows)
    LT.append(Seq((6L, "f")).toDF("id", "v"), root)
    val q2 = stream()
    q2.processAllAvailable(); q2.stop()
    assert(seen.asScala.toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f")))
    assert(seen.size == 6, s"replayed rows detected: ${seen.asScala.toSeq.sorted}")
  }

  test("foreign-delta sink is exactly-once across a crash-replayed micro-batch") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    import scala.jdk.CollectionConverters._
    val base = Files.createTempDirectory("graft-foreign-sink")
    val srcRoot = base.resolve("src").toString
    val tgtRoot = base.resolve("tgt").toString
    val ckpt = base.resolve("ckpt")
    // the target is a FOREIGN Delta table (native manifest wiped)
    LT.create(Seq((0L, "seed")).toDF("id", "v"), tgtRoot)
    LT.exportDeltaLog(spark, tgtRoot)
    val mWalk = Files.walk(Paths.get(tgtRoot, "_manifest"))
    try mWalk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
    finally mWalk.close()
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), srcRoot)
    def stream() = Streams.ingestIntoDeltaForeign(
      spark.readStream.format("graft-table").option("path", srcRoot).load(),
      tgtRoot, ckpt.toString)
    val q = stream(); q.processAllAvailable()
    LT.append(Seq((3L, "c")).toDF("id", "v"), srcRoot)
    q.processAllAvailable(); q.stop()
    assert(LT.readDeltaExport(spark, tgtRoot).count() == 4)
    // CRASH SIMULATION — the at-least-once window foreachBatch has:
    // the sink committed batch 1 into the foreign log, but the stream
    // died before recording commits/1, so the restart RE-DELIVERS
    // batch 1. The setTransaction stamp must turn the replay into a
    // no-op; without it the foreign table double-ingests batch 1.
    val lastCommit = Files.list(ckpt.resolve("commits")).iterator().asScala
      .filter(_.getFileName.toString.matches("\\d+")).toSeq
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(lastCommit)
    // the local FS keeps a checksum twin; leaving it fails the re-write
    Files.deleteIfExists(lastCommit.resolveSibling(
      "." + lastCommit.getFileName.toString + ".crc"))
    val q2 = stream(); q2.processAllAvailable(); q2.stop()
    val rows = LT.readDeltaExport(spark, tgtRoot)
      .select($"id", $"v").as[(Long, String)].collect().toSeq
    assert(rows.size == 4, s"replayed batch must dedup: $rows")
    assert(rows.toSet ==
      Set((0L, "seed"), (1L, "a"), (2L, "b"), (3L, "c")))
    // and the checkpoint parquet carries the watermark through cleanup
    LT.checkpointDeltaForeign(spark, tgtRoot)
    LT.cleanupDeltaLogForeign(tgtRoot)
    LT.append(Seq((4L, "d")).toDF("id", "v"), srcRoot)
    val q3 = stream(); q3.processAllAvailable(); q3.stop()
    assert(LT.readDeltaExport(spark, tgtRoot).count() == 5)
  }

  test("maxVersionsPerBatch admits a backlog one manifest version at a time, across restart") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("graft-table-throttle")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    LT.create(Seq((1L, "a")).toDF("id", "v"), root)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Set[(Long, String)]]()
    def stream() = spark.readStream
      .format("graft-table").option("path", root)
      .option("maxVersionsPerBatch", "1").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = b.collect().map(r => (r.getLong(0), r.getString(1))).toSet
        if (s.nonEmpty) batches.add(s); ()
      }.start()
    val q = stream()
    q.processAllAvailable() // snapshot batch (v0)
    q.stop()
    // three commits while the query is DOWN — the backlog a backfill or a
    // busy table produces
    LT.append(Seq((2L, "b")).toDF("id", "v"), root)
    LT.append(Seq((3L, "c")).toDF("id", "v"), root)
    LT.append(Seq((4L, "d")).toDF("id", "v"), root)
    val q2 = stream()
    q2.processAllAvailable(); q2.stop()
    import scala.jdk.CollectionConverters._
    val bs = batches.asScala.toList
    // the persisted anchor makes the cap hold ACROSS the restart: the
    // backlog must arrive as three single-version batches, in order —
    // one giant catch-up batch here means the throttle is dormant
    assert(bs == List(Set((1L, "a")), Set((2L, "b")), Set((3L, "c")), Set((4L, "d"))),
      s"expected 4 single-version batches, got $bs")
  }

  test("delta-export source tails a foreign Delta log: stream ≡ batch readDeltaExport, restart-safe") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("delta-export-src")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    // ONE v0 file (ids 1 and 2 together): the COW-delete stage below
    // needs a rewrite WITH a survivor
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), root)
    LT.exportDeltaLog(spark, root) // write-through mirror: later commits advance the log
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def stream() = spark.readStream
      .format("delta-export").option("path", root).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((r.getLong(0), r.getString(1)))); ()
      }.start()
    val q = stream()
    q.processAllAvailable()
    import scala.jdk.CollectionConverters._
    // batch 0 = the log-v0 snapshot, exactly the batch foreign read
    assert(seen.asScala.toSet ==
      LT.readDeltaExport(spark, root, versionAsOf = Some(0L))
        .as[(Long, String)].collect().toSet)
    // appends while running: the write-through mirror advances the log
    // and the stream tails it — row set ≡ the batch foreign read
    LT.append(Seq((3L, "c")).toDF("id", "v"), root)
    q.processAllAvailable()
    LT.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), root)
    q.processAllAvailable()
    assert(seen.asScala.toSet ==
      LT.readDeltaExport(spark, root).as[(Long, String)].collect().toSet)
    assert(seen.size == 5, s"replayed rows: ${seen.asScala.toSeq.sorted}")
    q.stop()
    // RESTART: a commit made while the query was DOWN arrives exactly once
    LT.append(Seq((6L, "f")).toDF("id", "v"), root)
    val q2 = stream()
    q2.processAllAvailable(); q2.stop()
    assert(seen.asScala.toSet.map((t: (Long, String)) => t._1) == (1L to 6L).toSet)
    assert(seen.size == 6, s"replayed rows: ${seen.asScala.toSeq.sorted}")
    // a COW delete exports remove actions → the tail REFUSES without
    // ignoreChanges (re-emitting survivors would corrupt downstream)
    LT.deleteWhere(spark, root, "id = 1") // rewrites the v0 file (ids 1, 2)
    val q3 = stream()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    q3.stop()
    assert(ex.getMessage.contains("remove actions") ||
      Option(ex.getCause).exists(_.getMessage.contains("remove actions")))
    // with ignoreChanges: the range's net adds re-emit (per-file replay)
    val seen2 = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q4 = spark.readStream
      .format("delta-export").option("path", root)
      .option("ignoreChanges", "true").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt) // same lineage: resumes past v3
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen2.add((r.getLong(0), r.getString(1)))); ()
      }.start()
    q4.processAllAvailable(); q4.stop()
    // the delete rewrote the v0 file (ids 1, 2): its surviving row
    // (id 2) re-emits; untouched files do not
    assert(seen2.asScala.toSet == Set((2L, "b")),
      s"expected the rewritten file's survivor, got ${seen2.asScala.toSet}")
  }

  test("delta-export source startingVersion tails from a log version, skipping the snapshot") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("delta-export-sv")
    val root = base.resolve("tbl").toString
    LT.create(Seq((1L, "a")).toDF("id", "v"), root)
    LT.append(Seq((2L, "b")).toDF("id", "v"), root)
    LT.append(Seq((3L, "c")).toDF("id", "v"), root)
    LT.exportDeltaLog(spark, root)
    val got = runToCompletion(
      spark.readStream.format("delta-export").option("path", root)
        .option("startingVersion", "1").load(),
      "delta_export_sv")
    // inclusive start at log v1: versions 1 and 2's adds, no v0 snapshot
    assert(got.as[(Long, String)].collect().toSet == Set((2L, "b"), (3L, "c")))
  }

  test("delta-export readChangeFeed streams row-level changes: snapshot inserts, cdc batches, restart-safe") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("delta-export-cdf")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), root)
    LT.enableChangeDataFeed(spark, root, Seq("id"))
    LT.exportDeltaLog(spark, root) // write-through from here on
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    def stream() = spark.readStream
      .format("delta-export").option("path", root)
      .option("readChangeFeed", "true").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((
          r.getAs[String]("_change_type"), r.getAs[Long]("id"),
          r.getAs[Long]("_commit_version")))); ()
      }.start()
    val q = stream()
    q.processAllAvailable()
    import scala.jdk.CollectionConverters._
    // initial snapshot: every live row as an insert stamped at log v1
    // (the enableChangeDataFeed metadata commit is the current version)
    assert(seen.asScala.toSet ==
      Set(("insert", 1L, 1L), ("insert", 2L, 1L)))
    // pure add while running: derived inserts at its own version
    LT.append(Seq((3L, "c")).toDF("id", "v"), root)
    q.processAllAvailable()
    assert(seen.asScala.toSet.contains(("insert", 3L, 2L)))
    // COW delete: in file-mode this REFUSES; in change-feed mode the cdc
    // rows flow — the delete arrives as a delete, the surviving row of
    // the rewritten file does NOT re-emit
    LT.deleteWhere(spark, root, "id = 1")
    q.processAllAvailable()
    q.stop()
    assert(seen.asScala.toSet.contains(("delete", 1L, 3L)))
    assert(seen.asScala.count(_._2 == 2L) == 1,
      s"survivor re-emitted: ${seen.asScala.toSeq.sorted}")
    // RESTART: a MOR delete committed while the query was down arrives
    // exactly once, as a cdc delete
    LT.deleteWhereMor(spark, root, "id = 2")
    val q2 = stream()
    q2.processAllAvailable(); q2.stop()
    assert(seen.asScala.toSeq.sorted == Seq(
      ("delete", 1L, 3L), ("delete", 2L, 4L),
      ("insert", 1L, 1L), ("insert", 2L, 1L), ("insert", 3L, 2L)),
      seen.asScala.toSeq.sorted.toString)
  }

  test("iceberg-export source tails a foreign Iceberg chain: stream ≡ snapshot + appends, restart-safe") {
    import spark.implicits._
    import graft.sources.{IcebergMeta, LakehouseTable => LT}
    val base = Files.createTempDirectory("iceberg-export-src")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root) // write-through from here on
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def stream() = spark.readStream
      .format("iceberg-export").option("path", root).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((r.getLong(0), r.getString(1)))); ()
      }.start()
    val q = stream()
    q.processAllAvailable()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == Set((1L, "a"), (2L, "b")))
    // appends while running: the commit hook advances the chain and the
    // stream tails the ADDED-files manifests — row set ≡ the chain read
    LT.append(Seq((3L, "c")).toDF("id", "v"), root)
    q.processAllAvailable()
    LT.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), root)
    q.processAllAvailable()
    assert(seen.asScala.toSet ==
      IcebergMeta.readIceberg(spark, root).as[(Long, String)].collect().toSet)
    assert(seen.size == 5, s"replayed rows: ${seen.asScala.toSeq.sorted}")
    q.stop()
    // RESTART: a snapshot committed while the query was DOWN arrives once
    LT.append(Seq((6L, "f")).toDF("id", "v"), root)
    val q2 = stream()
    q2.processAllAvailable(); q2.stop()
    assert(seen.size == 6, s"replayed rows: ${seen.asScala.toSeq.sorted}")
    // startingVersion (sequence, inclusive) skips the snapshot: from
    // seq 2, the three append snapshots' adds and nothing else
    val got = runToCompletion(
      spark.readStream.format("iceberg-export").option("path", root)
        .option("startingVersion", "2").load(),
      "iceberg_export_sv")
    assert(got.as[(Long, String)].collect().toSet ==
      Set((3L, "c"), (4L, "d"), (5L, "e"), (6L, "f")))
    // a COW delete produces an `overwrite` snapshot → the tail REFUSES
    LT.deleteWhere(spark, root, "id = 1")
    val q3 = stream()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    q3.stop()
    assert(ex.getMessage.contains("non-append") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-append")))
    // with ignoreChanges: the overwrite snapshot re-emits its rewritten
    // manifest's adds — a manifest REWRITE lists the whole live set, so
    // the replay unit is the live snapshot (documented; coarser than
    // Delta's per-file net)
    val seen2 = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q4 = spark.readStream
      .format("iceberg-export").option("path", root)
      .option("ignoreChanges", "true").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen2.add((r.getLong(0), r.getString(1)))); ()
      }.start()
    q4.processAllAvailable(); q4.stop()
    assert(seen2.asScala.toSet ==
      IcebergMeta.readIceberg(spark, root).as[(Long, String)].collect().toSet,
      s"overwrite replay should emit the live set, got ${seen2.asScala.toSet}")
  }

  test("iceberg-export ignoreChanges replay applies position deletes: survivors only") {
    import spark.implicits._
    import graft.sources.{IcebergMeta, LakehouseTable => LT}
    val base = Files.createTempDirectory("iceberg-export-mor")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    LT.create((0L until 10L).map(i => (i, "s")).toDF("id", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def stream(ic: Boolean) = spark.readStream
      .format("iceberg-export").option("path", root)
      .option("ignoreChanges", ic.toString).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add(r.getLong(0))); ()
      }.start()
    val q = stream(ic = false)
    q.processAllAvailable(); q.stop()
    assert(seen.asScalaSet == (0L until 10L).toSet)
    // while DOWN: an append, then a MOR delete of part of the new file —
    // the catch-up range is append + delete in one batch
    LT.append((10L until 15L).map(i => (i, "s")).toDF("id", "v")
      .coalesce(1), root)
    LT.deleteWhereMor(spark, root, "id >= 10 AND id % 2 = 0")
    seen.clear()
    val q2 = stream(ic = true)
    q2.processAllAvailable(); q2.stop()
    // the replay must emit the appended file's SURVIVORS — the range-end
    // snapshot's position-delete files applied — never 10/12/14
    assert(seen.asScalaSet == Set(11L, 13L),
      s"MOR-deleted rows resurrected in replay: ${seen.asScalaSet}")
  }

  private implicit class QAsSet[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    import scala.jdk.CollectionConverters._
    def asScalaSet: Set[A] = q.asScala.toSet
  }

  test("iceberg-export readChangeFeed streams the derived changelog: snapshot inserts, per-snapshot changes, restart-safe") {
    import spark.implicits._
    import graft.sources.{IcebergMeta, LakehouseTable => LT}
    val base = Files.createTempDirectory("iceberg-export-cdf")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root) // write-through from here on
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    def stream() = spark.readStream
      .format("iceberg-export").option("path", root)
      .option("readChangeFeed", "true").option("keys", "id").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((
          r.getAs[String]("_change_type"), r.getAs[Long]("id"),
          r.getAs[Long]("_sequence_number")))); ()
      }.start()
    val q = stream()
    q.processAllAvailable()
    import scala.jdk.CollectionConverters._
    // initial snapshot: every live row as an insert stamped at its own
    // sequence (the rule all three CDF sources share)
    assert(seen.asScala.toSet ==
      Set(("insert", 1L, 1L), ("insert", 2L, 1L)),
      seen.asScala.toSeq.sorted.toString)
    // pure append while running: derived inserts at the new sequence
    LT.append(Seq((3L, "c")).toDF("id", "v").coalesce(1), root)
    q.processAllAvailable()
    assert(seen.asScala.toSet.contains(("insert", 3L, 2L)))
    // COW delete (a rewrite snapshot): the removed row arrives as a
    // keyed-diff delete; the rewritten file's survivor does NOT re-emit
    LT.deleteWhere(spark, root, "id = 1")
    q.processAllAvailable()
    q.stop()
    assert(seen.asScala.toSet.contains(("delete", 1L, 3L)))
    assert(seen.asScala.count(_._2 == 2L) == 1,
      s"survivor re-emitted: ${seen.asScala.toSeq.sorted}")
    // RESTART: a MOR (position-delete) commit while the query was down
    // arrives exactly once, as a row-level delete
    LT.deleteWhereMor(spark, root, "id = 2")
    val q2 = stream()
    q2.processAllAvailable(); q2.stop()
    assert(seen.asScala.toSeq.sorted == Seq(
      ("delete", 1L, 3L), ("delete", 2L, 4L),
      ("insert", 1L, 1L), ("insert", 2L, 1L), ("insert", 3L, 2L)),
      seen.asScala.toSeq.sorted.toString)
    // stream ≡ batch: everything the stream landed equals the batch
    // icebergChangelog over the full range (the initial snapshot IS the
    // first snapshot's changelog)
    val batchSet = IcebergMeta.icebergChangelog(spark, root, 0L, 4L,
        Seq("id"))
      .select($"_change_type", $"id", $"_sequence_number")
      .as[(String, Long, Long)].collect().toSet
    assert(seen.asScala.toSet == batchSet,
      s"stream=${seen.asScala.toSeq.sorted} batch=${batchSet.toSeq.sorted}")
  }

  test("graft-table source composes with watermarked windowed aggregation (bronze → silver)") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    // bronze: the staged events ingested as a graft table; silver: a
    // tumbling-hour rollup STREAMED off the bronze table through the
    // graft-table source — the medallion shape with a real source stage
    // instead of a foreachBatch side channel
    val base = Files.createTempDirectory("graft-src-medallion")
    val bronze = base.resolve("bronze").toString
    val q0 = Streams.ingestInto(Streams.eventsStream(spark, streamDir), bronze,
      base.resolve("ckpt0").toString)
    q0.processAllAvailable(); q0.stop()
    val stream = spark.readStream.format("graft-table")
      .option("path", bronze).load()
      .withColumn("ts", col("ts")) // already session-TZ from ingestion
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("n"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("t_src_silver").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_src_silver").as[(java.sql.Timestamp, Long)]
      .collect().toSet
    val want = graft.sources.LakehouseTable.read(spark, bronze)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("graft-table source fails on a mid-stream TYPE change; additive columns tail as nulls") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("graft-src-schema")
    // additive evolution: ALTER ADD COLUMNS mid-stream is safe — new
    // column absent from the declared schema, batches keep flowing
    val addRoot = base.resolve("tadd").toString
    LT.create(Seq((1, 1.5f)).toDF("i", "f"), addRoot)
    val q1 = spark.readStream.format("graft-table").option("path", addRoot).load()
      .writeStream.outputMode("append").format("memory")
      .option("checkpointLocation", base.resolve("ck1").toString)
      .queryName("t_src_add").start()
    q1.processAllAvailable()
    LT.alterAddColumns(addRoot, "extra STRING")
    LT.append(Seq((2, 2.5f)).toDF("i", "f"), addRoot)
    q1.processAllAvailable(); q1.stop()
    assert(spark.table("t_src_add").count() == 2)
    // TYPE change: widening mid-stream must FAIL the query (a silent
    // double→float down-cast would truncate), restart adopts the schema
    val root = base.resolve("twiden").toString
    LT.create(Seq((1, 1.5f)).toDF("i", "f"), root)
    val q2 = spark.readStream.format("graft-table").option("path", root).load()
      .writeStream.outputMode("append").format("memory")
      .option("checkpointLocation", base.resolve("ck2").toString)
      .queryName("t_src_widen").start()
    q2.processAllAvailable()
    LT.alterWidenColumnType(spark, root, "f", "double")
    LT.append(Seq((2, 9.0)).toDF("i", "f"), root)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable(); q2.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(err).exists(c =>
      Option(c.getMessage).exists(_.contains("changed type"))))
    // a fresh query adopts the widened schema and reads everything
    spark.sql("DROP TABLE IF EXISTS t_src_widen2")
    val q3 = spark.readStream.format("graft-table").option("path", root).load()
      .writeStream.outputMode("append").format("memory")
      .option("checkpointLocation", base.resolve("ck3").toString)
      .queryName("t_src_widen2").start()
    q3.processAllAvailable(); q3.stop()
    assert(spark.table("t_src_widen2").as[(Long, Double)].collect().toSet ==
      Set((1L, 1.5), (2L, 9.0)))
    // DROP COLUMN mid-stream must also fail, never silently null-fill
    val dropRoot = base.resolve("tdrop").toString
    LT.create(Seq((1, "a")).toDF("i", "v"), dropRoot)
    val q4 = spark.readStream.format("graft-table").option("path", dropRoot).load()
      .writeStream.outputMode("append").format("memory")
      .option("checkpointLocation", base.resolve("ck4").toString)
      .queryName("t_src_drop").start()
    q4.processAllAvailable()
    LT.alterDropColumns(spark, dropRoot, Seq("v"))
    LT.append(Seq(Tuple1(2)).toDF("i"), dropRoot)
    val err2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q4.processAllAvailable(); q4.awaitTermination()
    }
    assert(causes(err2).exists(c =>
      Option(c.getMessage).exists(_.contains("dropped or renamed"))))
  }

  test("maxFilesPerBatch splits a giant commit into bounded batches, restart-safe; anchor lives in the checkpoint") {
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("graft-table-filecap")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    // v0: a multi-file snapshot (round-robin repartition; AQE may coalesce,
    // so the expected batch count is derived from the committed manifest)
    // — with cap 2 it must arrive as ⌈files/2⌉ batches
    LT.create(spark.range(0, 10, 1, 5).select(col("id"),
      (col("id") % 5).cast("string").as("v")), root)
    val snapFiles = LT.fileCount(root, 0L)
    assert(snapFiles >= 3, s"fixture too small: $snapFiles files at v0")
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    def stream() = spark.readStream
      .format("graft-table").option("path", root)
      .option("maxFilesPerBatch", "2").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = b.collect().map(_.getLong(0)).toSet
        if (s.nonEmpty) batches.add(s); ()
      }.start()
    val q = stream()
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    assert(batches.size == (snapFiles + 1) / 2,
      s"$snapFiles-file snapshot at cap 2 should arrive as ${(snapFiles + 1) / 2} " +
        s"batches, got ${batches.asScala.toList}")
    assert(batches.asScala.flatten.toSet == (0L until 10L).toSet)
    // the admission anchor must live INSIDE the checkpoint (metadataPath
    // is a file: URI — resolved through Hadoop FS, not java.nio), and no
    // cwd-relative 'file:' litter may appear
    assert(Files.exists(Paths.get(ckpt, "sources", "0", "graft-last-planned")),
      "anchor not persisted under the checkpoint's sources/0 dir")
    assert(Files.notExists(Paths.get("file:")),
      "cwd-relative 'file:' directory created — metadataPath URI mishandled")
    // one multi-file commit while the query is DOWN → the restarted
    // stream (anchor-carried cap) must admit it as ⌈files/2⌉ batches,
    // no replays
    LT.append(spark.range(10, 18, 1, 4).select(col("id"),
      (col("id") % 5).cast("string").as("v")), root)
    val commitFiles = LT.fileCount(root, 1L) - snapFiles
    assert(commitFiles >= 3, s"fixture too small: $commitFiles files in commit")
    batches.clear()
    val q2 = stream()
    q2.processAllAvailable(); q2.stop()
    assert(batches.size == (commitFiles + 1) / 2,
      s"$commitFiles-file commit at cap 2 should arrive as " +
        s"${(commitFiles + 1) / 2} batches, got ${batches.asScala.toList}")
    assert(batches.asScala.flatten.toSet == (10L until 18L).toSet,
      s"replayed or lost rows: ${batches.asScala.toList}")
  }

  test("a vacuumed diff base fails the cursor loudly instead of silently re-diffing") {
    import graft.sources.{LakehouseTable => LT}
    import spark.implicits._
    val base = Files.createTempDirectory("graft-table-vacbase")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    LT.create(spark.range(0, 4, 1, 2).select(col("id"),
      lit("x").as("v")), root)                      // v0: 2 files
    def stream() = spark.readStream
      .format("graft-table").option("path", root)
      .option("maxFilesPerBatch", "2").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.count(); ()
      }.start()
    val q = stream()
    q.processAllAvailable(); q.stop() // cursor rests at v0
    // two commits while down, then vacuum v0 away: the restarted cursor
    // must walk v1's DIFF list, whose base manifest (v0) no longer
    // exists — silently re-diffing against nothing would re-emit v0's
    // carried files; the source must fail loudly instead
    LT.append(spark.range(4, 12, 1, 4).select(col("id"),
      lit("x").as("v")), root)                      // v1
    LT.append(Seq((99L, "x")).toDF("id", "v"), root) // v2
    assert(LT.vacuum(root, retainLast = 2) >= 0)
    assert(LT.versions(root) == Seq(1L, 2L))
    val q2 = stream()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable(); q2.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(ex).exists(c => Option(c.getMessage)
      .exists(_.contains("removed by VACUUM"))),
      s"expected the loud vacuumed-base error, got: ${ex.getMessage}")
  }

  test("file-capped stream with a LOST anchor degrades to one catch-up batch — never re-emits") {
    import graft.sources.{LakehouseTable => LT}
    import spark.implicits._
    val base = Files.createTempDirectory("graft-table-lostanchor")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    LT.create(spark.range(0, 8, 1, 4).select(col("id"),
      (col("id") % 2).cast("string").as("v")), root)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def stream() = spark.readStream
      .format("graft-table").option("path", root)
      .option("maxFilesPerBatch", "2").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add(r.getLong(0))); ()
      }.start()
    val q = stream()
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == (0L until 8L).toSet && seen.size == 8)
    // lose the admission anchor while the query is down (the documented
    // degrade), commit more rows, restart: the committed offset is an
    // INCREMENTAL cursor — a snapshot-flagged plan here would slice the
    // full manifest and re-emit delivered rows
    Files.delete(Paths.get(ckpt, "sources", "0", "graft-last-planned"))
    LT.append(spark.range(8, 12, 1, 2).select(col("id"),
      (col("id") % 2).cast("string").as("v")), root)
    val q2 = stream()
    q2.processAllAvailable(); q2.stop()
    assert(seen.asScala.toSet == (0L until 12L).toSet,
      s"lost rows: ${seen.asScala.toSet}")
    assert(seen.size == 12,
      s"lost-anchor restart re-emitted rows: ${seen.asScala.toSeq.sorted}")
  }

  test("startingVersion / startingTimestamp skip the snapshot and tail from the declared commit") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("graft-table-startv")
    val root = base.resolve("tbl").toString
    LT.create(Seq((1L, "a")).toDF("id", "v"), root)          // v0
    Thread.sleep(15)
    LT.append(Seq((2L, "b")).toDF("id", "v"), root)          // v1
    Thread.sleep(15)
    LT.append(Seq((3L, "c")).toDF("id", "v"), root)          // v2
    def collectFrom(opts: Map[String, String], ckpt: String): Set[Long] = {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = opts.foldLeft(
          spark.readStream.format("graft-table").option("path", root))(
          (r, kv) => r.option(kv._1, kv._2)).load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", base.resolve(ckpt).toString)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => seen.add(r.getLong(0))); ()
        }.start()
      q.processAllAvailable(); q.stop()
      import scala.jdk.CollectionConverters._
      seen.asScala.toSet
    }
    // inclusive version start: v1's and v2's rows, never the v0 snapshot
    assert(collectFrom(Map("startingVersion" -> "1"), "ck1") == Set(2L, 3L))
    // startingVersion 0 = the whole history as diffs (≡ snapshot content)
    assert(collectFrom(Map("startingVersion" -> "0"), "ck0") == Set(1L, 2L, 3L))
    // "latest": nothing yet — then only commits made after stream start
    assert(collectFrom(Map("startingVersion" -> "latest"), "ckl").isEmpty)
    LT.append(Seq((4L, "d")).toDF("id", "v"), root)          // v3
    assert(collectFrom(Map("startingVersion" -> "latest"), "ckl") == Set(4L),
      "the resumed latest-stream must see exactly the post-start commit")
    // timestamp start: first commit at/after v2's stamp → rows of v2, v3
    val ts2 = new java.sql.Timestamp(LT.commitTsAt(root, 2L).get).toString
    assert(collectFrom(Map("startingTimestamp" -> ts2), "ckt") == Set(3L, 4L))
    // both options together are refused
    val ex = intercept[Exception] {
      collectFrom(Map("startingVersion" -> "1", "startingTimestamp" -> ts2), "ckb")
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(ex).exists(c => Option(c.getMessage)
      .exists(_.contains("mutually exclusive"))))
  }

  test("graft-table SINK: writeStream lands txn-stamped appends; table-to-table pipeline exactly-once across restart") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("graft-table-sink")
    val src = base.resolve("src").toString
    val dst = base.resolve("dst").toString
    val ckpt = base.resolve("ckpt").toString
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src)
    // source table → streaming → SINK table: the whole pipeline is the
    // one format string on both ends
    def pipeline() = spark.readStream
      .format("graft-table").option("path", src).load()
      .writeStream.format("graft-table")
      .option("path", dst)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q = pipeline()
    q.processAllAvailable(); q.stop()
    def dstRows() = LT.read(spark, dst).select("id")
      .as[Long].collect().sorted.toSeq
    assert(dstRows() == Seq(1L, 2L))
    // the sink's commits are txn-stamped under a per-checkpoint app id
    assert(LT.lastTxns(dst).keys.exists(_.startsWith("ckpt-")))
    // commits while DOWN arrive exactly once after restart; replays of
    // already-committed batch ids are skipped by the txn watermark
    LT.append(Seq((3L, "c")).toDF("id", "v"), src)
    val q2 = pipeline()
    q2.processAllAvailable(); q2.stop()
    assert(dstRows() == Seq(1L, 2L, 3L), s"got ${dstRows()}")
    val versionsAfter = LT.versions(dst).size
    // an idle restart commits nothing (no empty-batch version churn, no
    // duplicate rows)
    val q3 = pipeline()
    q3.processAllAvailable(); q3.stop()
    assert(dstRows() == Seq(1L, 2L, 3L))
    assert(LT.versions(dst).size <= versionsAfter + 1,
      s"idle restart ballooned versions: ${LT.versions(dst)}")
    // update mode is refused up front
    val ex = intercept[Exception] {
      spark.readStream.format("graft-table").option("path", src).load()
        .groupBy(col("v")).count()
        .writeStream.format("graft-table")
        .option("path", base.resolve("dst2").toString)
        .option("checkpointLocation", base.resolve("ck2").toString)
        .outputMode("complete").start()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("Append output mode only"))))
  }

  test("graft-table source refuses a rewrite range unless ignoreChanges") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("graft-table-src-rw")
    val root = base.resolve("tbl").toString
    LT.create(Seq((1L, 5.0), (2L, 50.0)).toDF("id", "v"), root)
    val q = spark.readStream.format("graft-table").option("path", root).load()
      .writeStream.outputMode("append").format("memory")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .queryName("t_graft_rw").start()
    q.processAllAvailable()
    // a COW delete rewrites the surviving file → the next batch MUST fail
    LT.deleteWhere(spark, root, "v < 10.0", Nil)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable(); q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(err).exists(_.getMessage != null) &&
      causes(err).exists(c => Option(c.getMessage).exists(_.contains("rewrote or dropped"))))
  }

  test("graft-table readChangeFeed: native streaming CDF — snapshot inserts, per-commit changes, restart-safe") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("graft-table-cdf")
    val root = base.resolve("tbl").toString
    val ckpt = base.resolve("ckpt").toString
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), root)
    LT.enableChangeDataFeed(spark, root, Seq("id"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    def stream() = spark.readStream
      .format("graft-table").option("path", root)
      .option("readChangeFeed", "true").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((
          r.getAs[String]("_change_type"), r.getAs[Long]("id"),
          r.getAs[Long]("_commit_version"))))
        ()
      }.start()
    val q = stream()
    q.processAllAvailable()
    import scala.jdk.CollectionConverters._
    // initial snapshot: every live row as an insert stamped at the
    // then-current version (the enableChangeDataFeed metadata commit)
    assert(seen.asScala.toSet ==
      Set(("insert", 1L, 1L), ("insert", 2L, 1L)), seen.asScala.toSet.toString)
    // pure append while running: inserts at its own commit version
    LT.append(Seq((3L, "c")).toDF("id", "v"), root)
    q.processAllAvailable()
    assert(seen.asScala.toSet.contains(("insert", 3L, 2L)))
    // COW delete: file-mode REFUSES this; change-feed mode emits the
    // row-level delete, and the rewritten file's survivor does NOT
    // re-emit
    LT.deleteWhere(spark, root, "id = 1")
    q.processAllAvailable()
    q.stop()
    assert(seen.asScala.toSet.contains(("delete", 1L, 3L)))
    assert(seen.asScala.count(_._2 == 2L) == 1,
      s"survivor re-emitted: ${seen.asScala.toSeq.sorted}")
    // RESTART: a MOR (deletion-vector) delete committed while the query
    // was down arrives exactly once, as a row-level delete
    LT.deleteWhereMor(spark, root, "id = 2")
    val q2 = stream()
    q2.processAllAvailable(); q2.stop()
    assert(seen.asScala.toSeq.sorted == Seq(
      ("delete", 1L, 3L), ("delete", 2L, 4L),
      ("insert", 1L, 1L), ("insert", 2L, 1L), ("insert", 3L, 2L)),
      seen.asScala.toSeq.sorted.toString)
    // the native stream's cumulative change set ≡ the batch changeFeed
    // over the same history (initial snapshot folded in as v<=1 inserts)
    val batchCf = (2L to 4L).map(w =>
        LT.changeFeed(spark, root, w - 1, w, Seq("id"))
          .withColumn("_commit_version", lit(w)))
      .reduce(_ unionByName _)
      .select(col("_change_type"), col("id"), col("_commit_version"))
      .as[(String, Long, Long)].collect().toSet
    assert(seen.asScala.toSet.filter(_._3 >= 2L) == batchCf)
  }

  test("graft-table readChangeFeed admission caps are version-atomic past the snapshot") {
    import spark.implicits._
    import graft.sources.{LakehouseTable => LT}
    val base = Files.createTempDirectory("graft-table-cdf-caps")
    val root = base.resolve("tbl").toString
    LT.create(Seq((1L, "a")).toDF("id", "v").coalesce(1), root)
    LT.enableChangeDataFeed(spark, root, Seq("id"))
    // one commit carrying THREE files, then a one-file commit
    LT.append(Seq((2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
      .repartition(3), root)
    LT.append(Seq((5L, "e")).toDF("id", "v"), root)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Set[(Long, Long)]]()
    val q = spark.readStream
      .format("graft-table").option("path", root)
      .option("readChangeFeed", "true")
      .option("startingVersion", "2") // tail only: v2 (3 files) + v3
      .option("maxFilesPerBatch", "1").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.collect().map(r => (r.getAs[Long]("id"),
          r.getAs[Long]("_commit_version"))).toSet
        if (rows.nonEmpty) batches.add(rows)
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    val got = batches.asScala.toSeq
    // the 3-file commit must arrive WHOLE in one batch (change rows are
    // not file-addressable), the next commit in its own batch
    assert(got.contains(Set((2L, 2L), (3L, 2L), (4L, 2L))), got.toString)
    assert(got.contains(Set((5L, 3L))), got.toString)
    assert(got.flatten.toSet == Set((2L, 2L), (3L, 2L), (4L, 2L), (5L, 3L)),
      got.toString)
  }
}
