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

  test("streaming tumbling-hour counts match the batch aggregation") {
    val got = runToCompletion(
      Streams.tumblingHourly(Streams.eventsStream(spark, streamDir)), "t_tumble",
      mode = "complete")
      .select(col("hour"), col("event_type"), col("n"))
    val want = graft.sources.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming session windows match batch gap-sessionization boundaries") {
    val got = runToCompletion(
      Streams.sessionWindows(Streams.eventsStream(spark, streamDir)), "t_sess",
      mode = "complete")
    // batch twin: q40 sessions (30-min gap); compare (user, n_events) multisets
    // and session count — boundaries are identical because both close a
    // session after >30min inactivity.
    val want = SparkEntry.queries("q40_sessionize")(spark, sf)
    assert(got.count() == want.count())
    val gotSets = got.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("n_events"))).as("ns"))
    val wantSets = want.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("n_events"))).as("ns"))
    assert(gotSets.join(wantSets, Seq("user_id"))
      .filter(gotSets("ns") =!= wantSets("ns")).count() == 0)
  }

  test("streaming dedup keeps one row per (user, type) like batch q31") {
    val got = runToCompletion(
      Streams.dedupStream(Streams.eventsStream(spark, streamDir)), "t_dedup")
    val want = SparkEntry.queries("q31_exact_dedup")(spark, sf)
    assert(got.count() == want.count())
    assert(got.select("user_id", "event_type").exceptAll(
      want.select("user_id", "event_type")).isEmpty)
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
}
