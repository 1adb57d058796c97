package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergMeta, IcebergTransforms, LakehouseTable => LT}

/** Round-13 pins — Iceberg NON-IDENTITY partition-transform pruning
  * (the round-12 verdict's top item) plus the Delta-face planning
  * additions:
  *
  *  1. The bucket hash is the spec's murmur3_x86_32 over Appendix-B
  *     byte forms — pinned against the spec's own published vectors
  *     (int/long 34, date 2017-11-16, timestamp 2017-11-16T22:31:08,
  *     string "iceberg"). A wrong hash silently prunes MATCHING files.
  *  2. `day`/`month`/`year`/`hour` values derive exact UTC source
  *     ranges; a range predicate on the source timestamp plans only
  *     the matching transform partitions.
  *  3. `truncate[W]` derives int ranges and string prefix ranges
  *     (range predicates prune too, not just equality).
  *  4. `bucket[N]` prunes equality/IN by re-hashing the literal and
  *     NEVER prunes range predicates (hash order is unrelated to value
  *     order).
  *  5. A null transform value means every source row is null
  *     (transforms are null-preserving): pruned for comparisons, kept
  *     for IS NULL.
  *  6. All three faces — native footer-stats readPruned, Iceberg
  *     manifest bounds, Delta add-action stats — plan the SAME files
  *     on the same range-clustered history (q203/q204's triangle,
  *     closed).
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/r13_$name"
    val p = Paths.get(r)
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(p)
    r
  }

  test("bucket hash matches the Iceberg spec's Appendix B vectors") {
    import IcebergTransforms._
    assert(bucketHashLong(34L) == 2017239379,
      "int/long 34 (8-byte little-endian)")
    assert(bucketHashLong(17486L) == -653330422,
      "date 2017-11-16 = epoch day 17486")
    assert(bucketHashLong(1510871468000000L) == -2047944441,
      "timestamp 2017-11-16T22:31:08 UTC = micros 1510871468000000")
    assert(bucketHashString("iceberg") == 1210000089, "string 'iceberg'")
  }

  test("temporal transform ranges are exact UTC unit ranges") {
    import IcebergTransforms._
    import org.apache.spark.sql.types.{DateType, TimestampType}
    val MicrosPerDay = 86400000000L
    // day 19723 = 2024-01-01
    assert(temporalRange(Day, 19723L, TimestampType).contains(
      (BigDecimal(19723L) * MicrosPerDay,
        BigDecimal(19724L) * MicrosPerDay - 1)))
    assert(temporalRange(Day, 19723L, DateType).contains(
      (BigDecimal(19723), BigDecimal(19723))))
    // month 648 = 2024-01 (54 years * 12): Jan has 31 days
    val jan1 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    assert(temporalRange(Month, 648L, DateType).contains(
      (BigDecimal(jan1), BigDecimal(jan1 + 30))))
    // year 54 = 2024 (a leap year: 366 days)
    assert(temporalRange(Year, 54L, DateType).contains(
      (BigDecimal(jan1), BigDecimal(jan1 + 365))))
    // hour of a date column is undefined — no range, conservative
    assert(temporalRange(Hour, 1L, DateType).isEmpty)
    assert(temporalRange(Hour, 2L, TimestampType).contains(
      (BigDecimal(7200000000L), BigDecimal(10800000000L) - 1)))
  }

  test("string prefix upper bound is strictly above every prefixed string") {
    import IcebergTransforms._
    assert(stringPrefixUpper("HO").contains("HP"))
    assert(stringPrefixUpper("").isEmpty)
    // unsigned UTF-8 byte order — the order the evaluator compares in
    def utf8Cmp(x: String, y: String): Int = {
      val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
      a.zip(b).map { case (p, q) => (p & 0xff) - (q & 0xff) }
        .find(_ != 0).getOrElse(a.length - b.length)
    }
    assert(utf8Cmp("HOUSEHOLD", "HP") < 0)
    assert(utf8Cmp("HO" + "\uFFFF\uFFFF\uFFFF", "HP") < 0)
  }

  /** One file per distinct `partCol` value, exported, then converted
    * to the foreign transform spec (partCol leaves the schema, the
    * spec says `transform(srcCol)`, srcCol metrics stripped). */
  private def transformChain(root: String,
      df: org.apache.spark.sql.DataFrame, partCol: String,
      transform: String, srcCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    LT.create(df.repartition(col(partCol)), root,
      partitionBy = Seq(partCol))
    IcebergMeta.exportIcebergMeta(spark, root)
    IcebergMeta.convertSpecToTransform(root,
      Map(partCol -> ((transform, srcCol))))
  }

  test("day(ts) spec: a timestamp range plans only the matching days") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = freshRoot("day_spec")
    val rows = (0 until 6).map { i =>
      // two rows per day across 2024-01-01..03
      (i.toLong, java.sql.Timestamp.from(java.time.Instant.parse(
        f"2024-01-0${i / 2 + 1}%dT0${i % 2 * 6}%d:30:00Z")))
    }
    transformChain(root, rows.toDF("id", "ts")
      .withColumn("ts_day", expr("date_from_unix_date(CAST(" +
        "floor(unix_micros(ts) / 86400000000) AS INT))")),
      "ts_day", "day", "ts")
    val full = IcebergMeta.readIceberg(spark, root)
    assert(full.columns.toSeq == Seq("id", "ts"),
      "the transform column must leave the schema")
    assert(full.inputFiles.length == 3)
    val pruned = IcebergMeta.readIceberg(spark, root, pruneWhere = Some(
      "ts >= TIMESTAMP '2024-01-02 00:00:00' AND " +
        "ts < TIMESTAMP '2024-01-03 00:00:00'"))
    assert(pruned.select($"id").as[Long].collect().toSet == Set(2L, 3L))
    assert(pruned.inputFiles.length == 1,
      s"day transform must plan ONE file: ${pruned.inputFiles.toSeq}")
    // equality on an exact boundary instant
    val eq = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("ts = TIMESTAMP '2024-01-03 06:30:00'"))
    assert(eq.select($"id").as[Long].collect().toSet == Set(5L))
    assert(eq.inputFiles.length == 1)
  }

  test("hour/month/year specs derive source ranges from unit values") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // hour(ts): 3 hours, one file each
    val hr = freshRoot("hour_spec")
    val hrows = (0 until 6).map { i =>
      (i.toLong, java.sql.Timestamp.from(java.time.Instant.parse(
        f"2024-01-01T0${i / 2}%d:${i % 2 * 30}%02d:00Z")))
    }
    transformChain(hr, hrows.toDF("id", "ts")
      .withColumn("ts_hour",
        expr("CAST(floor(unix_micros(ts) / 3600000000) AS INT)")),
      "ts_hour", "hour", "ts")
    val hp = IcebergMeta.readIceberg(spark, hr, pruneWhere = Some(
      "ts >= TIMESTAMP '2024-01-01 01:00:00' AND " +
        "ts < TIMESTAMP '2024-01-01 02:00:00'"))
    assert(hp.select($"id").as[Long].collect().toSet == Set(2L, 3L))
    assert(hp.inputFiles.length == 1, hp.inputFiles.toSeq.toString)

    // month(d) over a DATE column: 3 months, one file each
    val mr = freshRoot("month_spec")
    val mrows = Seq((1L, "2024-01-15"), (2L, "2024-02-15"), (3L, "2024-03-15"))
      .map { case (i, d) => (i, java.sql.Date.valueOf(d)) }
    transformChain(mr, mrows.toDF("id", "d")
      .withColumn("d_month",
        expr("CAST((year(d) - 1970) * 12 + month(d) - 1 AS INT)")),
      "d_month", "month", "d")
    val mp = IcebergMeta.readIceberg(spark, mr,
      pruneWhere = Some("d >= DATE'2024-02-01' AND d < DATE'2024-03-01'"))
    assert(mp.select($"id").as[Long].collect().toSet == Set(2L))
    assert(mp.inputFiles.length == 1, mp.inputFiles.toSeq.toString)

    // year(d): 3 years, one file each
    val yr = freshRoot("year_spec")
    val yrows = Seq((1L, "2022-06-01"), (2L, "2023-06-01"), (3L, "2024-06-01"))
      .map { case (i, d) => (i, java.sql.Date.valueOf(d)) }
    transformChain(yr, yrows.toDF("id", "d")
      .withColumn("d_year", expr("CAST(year(d) - 1970 AS INT)")),
      "d_year", "year", "d")
    val yp = IcebergMeta.readIceberg(spark, yr,
      pruneWhere = Some("d >= DATE'2023-01-01' AND d <= DATE'2023-12-31'"))
    assert(yp.select($"id").as[Long].collect().toSet == Set(2L))
    assert(yp.inputFiles.length == 1, yp.inputFiles.toSeq.toString)
  }

  test("truncate[W] specs prune int ranges and string prefix ranges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // truncate[100] on a long key: files [0,99], [100,199], [200,299]
    val tr = freshRoot("trunc_int")
    val trows = Seq(5L, 50L, 110L, 150L, 210L, 250L).map(k => (k, k * 2))
    transformChain(tr, trows.toDF("k", "v")
      .withColumn("k_t", expr("CAST(k - (k % 100) AS BIGINT)")),
      "k_t", "truncate[100]", "k")
    val tp = IcebergMeta.readIceberg(spark, tr,
      pruneWhere = Some("k >= 120 AND k <= 220"))
    assert(tp.select($"k").as[Long].collect().toSet == Set(150L, 210L))
    assert(tp.inputFiles.length == 2, tp.inputFiles.toSeq.toString)

    // truncate[2] on strings: prefix files ap / ba
    val sr = freshRoot("trunc_str")
    val srows = Seq((1L, "apple"), (2L, "apricot"), (3L, "banana"))
    transformChain(sr, srows.toDF("id", "s")
      .withColumn("s_t", substring(col("s"), 1, 2)),
      "s_t", "truncate[2]", "s")
    val sp = IcebergMeta.readIceberg(spark, sr,
      pruneWhere = Some("s = 'banana'"))
    assert(sp.select($"id").as[Long].collect().toSet == Set(3L))
    assert(sp.inputFiles.length == 1, sp.inputFiles.toSeq.toString)
    // a RANGE over the prefix space prunes too (prefix upper bound)
    val rp = IcebergMeta.readIceberg(spark, sr,
      pruneWhere = Some("s >= 'b'"))
    assert(rp.select($"id").as[Long].collect().toSet == Set(3L))
    assert(rp.inputFiles.length == 1, rp.inputFiles.toSeq.toString)
  }

  test("bucket[N] prunes equality and IN, never ranges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = freshRoot("bucket_spec")
    val keys = (1L to 40L).toSeq
    val bucketOf = udf((k: java.lang.Long) => Integer.valueOf(
      (IcebergTransforms.bucketHashLong(k.longValue()) & Int.MaxValue) % 4))
    transformChain(root, keys.map(k => (k, k * 10)).toDF("k", "v")
      .withColumn("kb", bucketOf(col("k"))),
      "kb", "bucket[4]", "k")
    val full = IcebergMeta.readIceberg(spark, root)
    assert(full.inputFiles.length == 4)
    val eq = IcebergMeta.readIceberg(spark, root, pruneWhere = Some("k = 7"))
    assert(eq.select($"v").as[Long].collect().toSeq == Seq(70L))
    assert(eq.inputFiles.length == 1,
      s"bucket equality must plan ONE file: ${eq.inputFiles.toSeq}")
    val in = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("k IN (7, 13)"))
    val expected = Set(7L, 13L).map(k =>
      (IcebergTransforms.bucketHashLong(k) & Int.MaxValue) % 4).size
    assert(in.inputFiles.length == expected, in.inputFiles.toSeq.toString)
    assert(in.select($"k").as[Long].collect().toSet == Set(7L, 13L))
    // hash order says nothing about value order: ranges keep all files
    val rg = IcebergMeta.readIceberg(spark, root, pruneWhere = Some("k > 35"))
    assert(rg.inputFiles.length == 4,
      "a range predicate must not prune bucket partitions")
    assert(rg.select($"k").as[Long].collect().toSet ==
      keys.filter(_ > 35).toSet)
  }

  test("a null transform value is all-rows-null: pruned for =, kept for IS NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = freshRoot("day_null")
    val rows = Seq(
      (1L, Some(java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T06:00:00Z")))),
      (2L, None: Option[java.sql.Timestamp]))
    transformChain(root, rows.toDF("id", "ts")
      .withColumn("ts_day", expr("date_from_unix_date(CAST(" +
        "floor(unix_micros(ts) / 86400000000) AS INT))")),
      "ts_day", "day", "ts")
    assert(IcebergMeta.readIceberg(spark, root).inputFiles.length == 2)
    val cmp = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("ts >= TIMESTAMP '2024-01-01 00:00:00'"))
    assert(cmp.select($"id").as[Long].collect().toSet == Set(1L))
    assert(cmp.inputFiles.length == 1,
      s"the all-null file must be pruned: ${cmp.inputFiles.toSeq}")
    val isNull = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("ts IS NULL"))
    assert(isNull.select($"id").as[Long].collect().toSet == Set(2L))
    assert(isNull.inputFiles.length == 1,
      s"only the all-null file can match IS NULL: ${isNull.inputFiles.toSeq}")
  }

  test("all three faces plan the same files on one range-clustered history") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("face_parity")
    LT.create((1L to 400L).map(i => (i, i * 3)).toDF("id", "x")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    LT.exportDeltaLog(spark, root)
    LT.computeStats(spark, root, Seq("id"))
    val native = LT.readPruned(spark, root, "id", 1.0, 100.0)
      .filter(col("id") <= 100)
    val ice = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("id <= 100"))
    val delta = LT.readDeltaExport(spark, root,
      pruneWhere = Some("id <= 100"))
    val want = (1L to 100L).map(i => (i, i * 3)).toSet
    assert(native.as[(Long, Long)].collect().toSet == want)
    assert(ice.as[(Long, Long)].collect().toSet == want)
    assert(delta.as[(Long, Long)].collect().toSet == want)
    assert(native.inputFiles.length == 1,
      s"native footer stats must plan 1 of 4: ${native.inputFiles.toSeq}")
    assert(ice.inputFiles.length == 1, ice.inputFiles.toSeq.toString)
    assert(delta.inputFiles.length == 1, delta.inputFiles.toSeq.toString)
  }

  test("delta partitionValues prune stats-less hive partitions, through checkpoints, decoded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("delta_pv")
    // 'a/b' exercises the %XX decode: the hive dir is 'cat=a%2Fb' but
    // the spec form of the add action's value is the real string
    LT.create(Seq((1L, "a/b"), (2L, "b"), (3L, "c"),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "cat").repartition(col("cat")), root,
      partitionBy = Seq("cat"))
    LT.exportDeltaLog(spark, root)
    val logTxt = Files.readString(Paths.get(root, "_delta_log",
      f"${0L}%020d.json"))
    assert(logTxt.contains("\"cat\":\"a\\/b\"") ||
      logTxt.contains("\"cat\":\"a/b\""),
      "partitionValues must carry the DECODED value")
    assert(logTxt.contains("\"cat\":null"),
      "the default partition must serialize as JSON null")
    def planned(where: String) =
      LT.readDeltaExport(spark, root, pruneWhere = Some(where))
    val eq = planned("cat = 'a/b'")
    assert(eq.select($"id").as[Long].collect().toSet == Set(1L))
    assert(eq.inputFiles.length == 1,
      s"partition equality must plan ONE file: ${eq.inputFiles.toSeq}")
    val isNull = planned("cat IS NULL")
    assert(isNull.select($"id").as[Long].collect().toSet == Set(4L))
    assert(isNull.inputFiles.length == 1, isNull.inputFiles.toSeq.toString)
    val notNull = planned("cat IS NOT NULL")
    assert(notNull.inputFiles.length == 3,
      "the all-null partition must be pruned for IS NOT NULL")
    // the checkpoint must CARRY partitionValues and partitionColumns:
    // a checkpoint-seeded read (no JSON replay) still prunes
    LT.exportDeltaCheckpoint(spark, root, 0L)
    val seeded = planned("cat = 'a/b'")
    assert(seeded.select($"id").as[Long].collect().toSet == Set(1L))
    assert(seeded.inputFiles.length == 1,
      s"checkpoint-seeded reads must keep pruning: ${seeded.inputFiles.toSeq}")
  }

  test("delta timestamp stats skip time-clustered files; offset-less text never prunes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("delta_ts")
    val rows = (0 until 8).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        java.time.Instant.parse(f"2024-01-0${i / 2 + 1}%dT0${i % 2 * 6}%d:00:00Z")))
    }
    LT.create(rows.toDF("id", "ts")
      .repartitionByRange(4, col("ts")).sortWithinPartitions("ts"), root)
    LT.exportDeltaLog(spark, root)
    val logTxt = Files.readString(Paths.get(root, "_delta_log",
      f"${0L}%020d.json"))
    assert(logTxt.contains("T00:00:00Z"),
      "timestamp stats must be offset-carrying ISO-8601")
    val pruned = LT.readDeltaExport(spark, root, pruneWhere = Some(
      "ts >= TIMESTAMP '2024-01-02 00:00:00' AND " +
        "ts < TIMESTAMP '2024-01-03 00:00:00'"))
    assert(pruned.select($"id").as[Long].collect().toSet == Set(2L, 3L))
    assert(pruned.inputFiles.length == 1,
      s"one day = one range file: ${pruned.inputFiles.toSeq}")
    // an offset-LESS foreign bound is ambiguous and must not prune:
    // rewrite the log's stats to local-time text and re-read
    val lf = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    Files.writeString(lf, Files.readString(lf)
      .replaceAll("""(\d{2}:\d{2}:\d{2}(?:\.\d+)?)Z""", "$1"))
    val kept = LT.readDeltaExport(spark, root, useCheckpoint = false,
      pruneWhere = Some("ts >= TIMESTAMP '2024-01-02 00:00:00' AND " +
        "ts < TIMESTAMP '2024-01-03 00:00:00'"))
    assert(kept.select($"id").as[Long].collect().toSet == Set(2L, 3L))
    assert(kept.inputFiles.length == 4,
      "offset-less timestamp text must keep every file (no wrong prune)")
  }

  test("float stats compare in the widened-double shortest-repr space") {
    import spark.implicits._
    val root = freshRoot("delta_float")
    LT.create(Seq((1L, 1.1f), (2L, 2.2f)).toDF("id", "x").coalesce(1), root)
    LT.append(Seq((3L, 9.9f)).toDF("id", "x").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    // 1.1f widens to 1.1000000238418579 in Spark's double comparison:
    // a bound parsed as BigDecimal("1.1") would understate the first
    // file's hi and WRONGLY prune the matching row
    val eq = LT.readDeltaExport(spark, root,
      pruneWhere = Some("x = 1.1000000238418579"))
    assert(eq.select($"id").as[Long].collect().toSet == Set(1L),
      "the widened float row must survive planning AND the residual")
    assert(eq.inputFiles.length == 1, eq.inputFiles.toSeq.toString)
  }

  test("q205/q206/q207 fixtures plan the pinned file subsets at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val day = operators.Lakehouse.eventsDayChainRoot(spark, d)
    val full = IcebergMeta.readIceberg(spark, day)
    val pruned = IcebergMeta.readIceberg(spark, day, pruneWhere = Some(
      "ts >= TIMESTAMP '2024-01-10 00:00:00' AND " +
        "ts < TIMESTAMP '2024-01-12 00:00:00'"))
    assert(full.inputFiles.length >= 28, "one file per January day")
    assert(pruned.inputFiles.length == 2,
      s"two days must plan two files: ${pruned.inputFiles.toSeq}")

    val bucket = operators.Lakehouse.ordersBucketChainRoot(spark, d)
    val bPruned = IcebergMeta.readIceberg(spark, bucket,
      pruneWhere = Some("o_orderkey IN (7, 997)"))
    val expected = Set(7L, 997L).map(k =>
      (IcebergTransforms.bucketHashLong(k) & Int.MaxValue) % 8).size
    assert(IcebergMeta.readIceberg(spark, bucket).inputFiles.length == 8)
    assert(bPruned.inputFiles.length == expected,
      s"bucket IN must plan $expected of 8: ${bPruned.inputFiles.toSeq}")

    val trunc = operators.Lakehouse.customerTruncChainRoot(spark, d)
    val tPruned = IcebergMeta.readIceberg(spark, trunc,
      pruneWhere = Some("c_mktsegment = 'HOUSEHOLD'"))
    assert(IcebergMeta.readIceberg(spark, trunc).inputFiles.length == 5)
    assert(tPruned.inputFiles.length == 1,
      s"one segment prefix file: ${tPruned.inputFiles.toSeq}")
  }

  test("foreign append: commit readable, stats-bearing, CAS-protected, refusals loud") {
    import spark.implicits._
    val root = freshRoot("foreign_append")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    // make it FOREIGN: delete the graft manifest, only log + data remain
    val manifest = Paths.get(root, "_manifest")
    Files.walk(manifest).iterator().asScala.toSeq
      .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    val v = LT.appendDeltaForeign(spark, root,
      Seq((3L, 30L), (4L, 40L)).toDF("id", "v").coalesce(1))
    assert(v == 1L)
    val back = LT.readDeltaExport(spark, root)
    assert(back.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // the appended add carries stats: planning skips the OLD file for a
    // predicate only the new rows satisfy
    val pruned = LT.readDeltaExport(spark, root,
      pruneWhere = Some("id >= 3"))
    assert(pruned.as[(Long, Long)].collect().toSet ==
      Set((3L, 30L), (4L, 40L)))
    assert(pruned.inputFiles.length == 1,
      s"appended stats must skip the base file: ${pruned.inputFiles.toSeq}")
    // CAS under real contention: two writers race disjoint batches with
    // retry-on-CME; every batch must survive (POSIX rename OVERWRITES,
    // so a rename-based "CAS" would silently drop a committed version —
    // createLink is the fail-if-exists primitive the commit uses)
    val batches = (0 until 6).map(i =>
      Seq((100L + i, 1000L + i)).toDF("id", "v").coalesce(1))
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        (0 until 3).foreach { i =>
          val b = batches(t * 3 + i)
          var done = false
          while (!done) {
            try { LT.appendDeltaForeign(spark, root, b); done = true }
            catch { case _: java.util.ConcurrentModificationException => () }
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val after = LT.readDeltaExport(spark, root).as[(Long, Long)]
      .collect().toSet
    assert((100L until 106L).forall(i => after.contains((i, i + 900L))),
      s"a racing append lost a committed batch: $after")
    assert(LT.deltaLogVersions(root) == (0L to 7L),
      "6 racing appends over v1 must land as versions 2..7, gap-free")
    // refusals: schema mismatch (partitioned, mapped, generated-column
    // coverage lives in the dedicated tests below)
    val exSchema = intercept[IllegalArgumentException] {
      LT.appendDeltaForeign(spark, freshForeign("fa_schema"),
        Seq((1, "x")).toDF("id", "s"))
    }
    assert(exSchema.getMessage.contains("does not match"), exSchema.getMessage)
  }

  test("foreign append under COLUMN MAPPING writes physical names + field ids") {
    import spark.implicits._
    val root = freshRoot("fa_mapped")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1), root)
    // a rename activates column mapping on the export: the log's
    // schema carries physicalName/id metadata and mode=name
    LT.alterRenameColumn(spark, root, "v", "val")
    LT.exportDeltaLog(spark, root)
    Files.walk(Paths.get(root, "_manifest")).iterator().asScala.toSeq
      .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    val st = LT.readDeltaExport(spark, root)
    assert(st.columns.toSeq == Seq("id", "val"))
    // the append speaks LOGICAL names; the data must land physical
    val ver = LT.appendDeltaForeign(spark, root,
      Seq((3L, 30L), (4L, 40L)).toDF("id", "val").coalesce(1))
    val back = LT.readDeltaExport(spark, root)
    assert(back.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // byte-level: the appended parquet's FOOTER columns are the
    // PHYSICAL names (the pre-rename 'v'), not the logical 'val'
    val logTxt = Files.readString(Paths.get(root, "_delta_log",
      f"$ver%020d.json"))
    val addPath = """"path":"data\/([^"]+)"""".r
      .findFirstMatchIn(logTxt.replace("\\/", "/")).map(_.group(1))
      .orElse(""""path":"data/([^"]+)"""".r
        .findFirstMatchIn(logTxt).map(_.group(1)))
    assert(addPath.isDefined, logTxt.take(200))
    val footCols = {
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(
            Paths.get(root, "data", addPath.get).toString),
          new org.apache.hadoop.conf.Configuration()))
      try rd.getFooter.getFileMetaData.getSchema.getFields
        .asScala.map(_.getName).toSeq
      finally rd.close()
    }
    assert(footCols.contains("v") && !footCols.contains("val"),
      s"appended data must use PHYSICAL column names: $footCols")
    // and the appended stats (physical keys) still plan: a predicate
    // only the new rows satisfy skips the base file
    val pruned = LT.readDeltaExport(spark, root,
      pruneWhere = Some("val >= 30"))
    assert(pruned.as[(Long, Long)].collect().toSet ==
      Set((3L, 30L), (4L, 40L)))
    assert(pruned.inputFiles.length == 1,
      s"mapped stats must skip the base file: ${pruned.inputFiles.toSeq}")

    // ID MODE: flip the mode conf — the reader now resolves columns by
    // parquet FIELD ID, which only works on files that CARRY ids (the
    // fixture's base v0 file predates the mapping, so the pin reads a
    // pruned slice planning only APPENDED files — exactly the rows
    // whose footers this append wrote; a footer without ids would fail
    // the read outright, proving the ids landed)
    (0L to ver).foreach { n =>
      val lf2 = Paths.get(root, "_delta_log", f"$n%020d.json")
      Files.writeString(lf2, Files.readString(lf2).replace(
        """"delta.columnMapping.mode":"name"""",
        """"delta.columnMapping.mode":"id""""))
    }
    val ver2 = LT.appendDeltaForeign(spark, root,
      Seq((5L, 50L)).toDF("id", "val").coalesce(1))
    assert(ver2 == ver + 1)
    val idSlice = LT.readDeltaExport(spark, root, useCheckpoint = false,
      pruneWhere = Some("val >= 30"))
    assert(idSlice.as[(Long, Long)].collect().toSet ==
      Set((3L, 30L), (4L, 40L), (5L, 50L)),
      "id-mode resolution must serve the appended rows via field ids")
    assert(idSlice.inputFiles.length == 2,
      s"only the two appended files: ${idSlice.inputFiles.toSeq}")

    // GENERATED columns refuse: a declared generation expression is a
    // write obligation this writer cannot compute
    val genRoot = freshForeign("fa_generated")
    val glf = Paths.get(genRoot, "_delta_log", f"${0L}%020d.json")
    Files.writeString(glf, Files.readString(glf).replace(
      """{\"name\":\"v\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}""",
      """{\"name\":\"v\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.generationExpression\":\"id + 1\"}}"""))
    assert(Files.readString(glf).contains("generationExpression"))
    val exGen = intercept[IllegalArgumentException] {
      LT.appendDeltaForeign(spark, genRoot,
        Seq((2L, 3L)).toDF("id", "v").coalesce(1))
    }
    assert(exGen.getMessage.contains("generated columns"), exGen.getMessage)
  }

  test("foreign append lays out PARTITIONED tables with spec-form partitionValues") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fa_part")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
      .repartition(col("cat")), root, partitionBy = Seq("cat"))
    LT.exportDeltaLog(spark, root)
    Files.walk(Paths.get(root, "_manifest")).iterator().asScala.toSeq
      .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    // a NEW partition value, a decoded-special-char value, a NULL, and
    // a CONTROL-CHAR value (escapePathName round-trips \n through %0A;
    // embedded raw it would split the NDJSON action line and corrupt
    // the log for every reader — the JSON escape must cover it)
    val v = LT.appendDeltaForeign(spark, root,
      Seq((3L, "c"), (4L, "x/y"), (5L, null.asInstanceOf[String]),
        (6L, "a\nb"))
        .toDF("id", "cat").repartition(col("cat")))
    assert(v == 1L)
    val logTxt = Files.readString(
      Paths.get(root, "_delta_log", f"${1L}%020d.json"))
    assert(logTxt.contains("\"cat\":\"x\\/y\"") ||
      logTxt.contains("\"cat\":\"x/y\""),
      "the appended add must carry the DECODED partition value")
    assert(logTxt.contains("\"cat\":null"),
      "a null partition value must serialize as JSON null")
    val back = LT.readDeltaExport(spark, root)
    assert(back.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "x/y"),
        (5L, null.asInstanceOf[String]), (6L, "a\nb")))
    // the appended adds' partitionValues plan like any other's
    val pruned = LT.readDeltaExport(spark, root,
      pruneWhere = Some("cat = 'x/y'"))
    assert(pruned.select($"id").as[Long].collect().toSet == Set(4L))
    assert(pruned.inputFiles.length == 1,
      s"the appended partition must plan ONE file: ${pruned.inputFiles.toSeq}")
    // every committed line is one VALID JSON document (the raw-newline
    // corruption class, pinned at the byte level)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Files.readString(Paths.get(root, "_delta_log", f"${1L}%020d.json"))
      .split('\n').filter(_.nonEmpty).foreach(l => mapper.readTree(l))
    // UNKNOWABLE partitioning still refuses: strip partitionColumns
    // from the metaData (a foreign checkpoint's omission) — the adds
    // still carry partitionValues, so appending blind would mis-lay
    val lf = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    Files.writeString(lf, Files.readString(lf)
      .replace(""","partitionColumns":["cat"]""", ""))
    val ex = intercept[IllegalArgumentException] {
      LT.appendDeltaForeign(spark, root,
        Seq((6L, "d")).toDF("id", "cat"))
    }
    assert(ex.getMessage.contains("unknown"), ex.getMessage)
  }

  /** A minimal foreign-shaped (id BIGINT, v BIGINT) delta table. */
  private def freshForeign(name: String): String = {
    import spark.implicits._
    val root = freshRoot(name)
    LT.create(Seq((1L, 10L)).toDF("id", "v").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    root
  }

  test("append to a checkpoint-truncated log commits checkpoint+1, never version 0") {
    import spark.implicits._
    val root = freshForeign("fa_ckpt")
    LT.exportDeltaCheckpoint(spark, root, 0L)
    // a foreign log-retention job removed the JSON tail below the
    // checkpoint: the only version evidence left is _last_checkpoint
    Files.delete(Paths.get(root, "_delta_log", f"${0L}%020d.json"))
    val v = LT.appendDeltaForeign(spark, root,
      Seq((2L, 20L)).toDF("id", "v").coalesce(1))
    assert(v == 1L,
      "the commit must land ABOVE the checkpoint (a version-0 file " +
        "would be invisible to checkpoint-seeded readers)")
    assert(LT.readDeltaExport(spark, root).as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 20L)))
  }

  test("append refuses a nullable column into a non-nullable field") {
    import spark.implicits._
    val root = freshForeign("fa_nullable")
    // a FOREIGN writer's schema declaring id NOT NULL (our own export
    // records nullable:true, so doctor the log to the foreign shape)
    val lf = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    Files.writeString(lf, Files.readString(lf).replace(
      """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true""",
      """{\"name\":\"id\",\"type\":\"long\",\"nullable\":false"""))
    assert(Files.readString(lf).contains("""\"nullable\":false"""))
    val nullable = Seq((2L, 20L)).toDF("id", "v")
      .selectExpr("CAST(null AS BIGINT) AS id", "v")
    val ex = intercept[IllegalArgumentException] {
      LT.appendDeltaForeign(spark, root, nullable)
    }
    assert(ex.getMessage.contains("nullability"), ex.getMessage)
    // a NON-nullable df appends fine into the same table
    val v = LT.appendDeltaForeign(spark, root,
      Seq((2L, 20L)).toDF("id", "v").coalesce(1))
    assert(v == 1L)
  }

  test("a reused field NAME resolves per file; a reused FIELD-ID refuses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = freshRoot("spec_clash")
    val rows = Seq((1L, java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T06:00:00Z"))))
    transformChain(root, rows.toDF("id", "ts")
      .withColumn("ts_day", expr("date_from_unix_date(CAST(" +
        "floor(unix_micros(ts) / 86400000000) AS INT))")),
      "ts_day", "day", "ts")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val dir = Paths.get(root, "metadata")
    val hint = Files.readString(dir.resolve("version-hint.text")).trim
    val mf = dir.resolve(s"v$hint.metadata.json")
    def doctorSpec(specId: Int, fieldId: Int, mtimeBump: Long): Unit = {
      val node = mapper.readTree(Files.readString(mf))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val specs = node.get("partition-specs")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
      val clash = mapper.createObjectNode()
      clash.put("spec-id", specId)
      val fields = mapper.createArrayNode()
      val f = mapper.createObjectNode()
      f.put("name", "ts_day"); f.put("transform", "identity")
      f.put("source-id", 1); f.put("field-id", fieldId)
      fields.add(f); clash.set("fields", fields); specs.add(clash)
      Files.writeString(mf, node.toString)
      Files.setLastModifiedTime(mf, java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() + mtimeBump))
    }
    // a SECOND spec reusing the field NAME as identity of id, under a
    // FRESH field-id (what real evolution produces): the struct's own
    // fid 1000 still says day(ts) — per-file resolution serves the
    // chain exactly where round-13 pass-1 could only refuse
    doctorSpec(specId = 1, fieldId = 1001, mtimeBump = 2000)
    assert(IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("ts IS NOT NULL")).count() == 1)
    // ... and the day value still prunes through the reused name
    val pruned = IcebergMeta.readIceberg(spark, root, pruneWhere =
      Some("ts >= TIMESTAMP '2030-01-01 00:00:00'"))
    assert(pruned.count() == 0)
    assert(pruned.inputFiles.isEmpty, pruned.inputFiles.toSeq.toString)
    // but ONE field-id carrying two meanings across specs is
    // spec-invalid metadata: resolution cannot know which one the
    // struct value means — refuse, never mis-prune
    doctorSpec(specId = 2, fieldId = 1000, mtimeBump = 4000)
    val ex = intercept[IllegalArgumentException] {
      IcebergMeta.readIceberg(spark, root,
        pruneWhere = Some("ts IS NOT NULL")).count()
    }
    assert(ex.getMessage.contains("spec-invalid"), ex.getMessage)
  }

  test("escape sequences in _where predicates decode to lexer semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("where_escapes")
    LT.create(Seq((1L, "a\tb"), (2L, "atb"), (3L, "aAb"))
      .toDF("id", "cat").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    // \t inside the predicate literal must reach parseExpression as a
    // TAB (Spark lexer semantics), not the letter 't'
    val tab = graft.sql.GraftSql.sql(spark,
      s"SELECT id FROM delta_export_where('$root', 'cat = ''a\\tb''')")
    assert(tab.as[Long].collect().toSet == Set(1L), "backslash-t = TAB")
    // three-digit octal: \101 is 'A'
    val oct = graft.sql.GraftSql.sql(spark,
      s"SELECT id FROM delta_export_where('$root', 'cat = ''a\\101b''')")
    assert(oct.as[Long].collect().toSet == Set(3L), "backslash-101 = A")
  }

  test("iceberg foreign append: snapshot readable, metrics-bearing, deletes intact, CAS") {
    import spark.implicits._
    val root = freshRoot("ice_append")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    // make it FOREIGN: only the chain (and data) remain
    Files.walk(Paths.get(root, "_manifest")).iterator().asScala.toSeq
      .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    val parentSid = IcebergMeta.snapshots(root).last.id
    val sid = IcebergMeta.appendIcebergForeign(spark, root,
      Seq((3L, 30L), (4L, 40L)).toDF("id", "v").coalesce(1))
    val back = IcebergMeta.readIceberg(spark, root)
    assert(back.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // history intact: time travel to the parent sees only the old rows
    val old = IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(parentSid))
    assert(old.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L)))
    assert(IcebergMeta.snapshots(root).map(_.id).takeRight(2) ==
      Seq(parentSid, sid))
    // the appended manifest carries COLUMN METRICS: a predicate only
    // the new rows satisfy plans only the appended file
    val pruned = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("id >= 3"))
    assert(pruned.as[(Long, Long)].collect().toSet ==
      Set((3L, 30L), (4L, 40L)))
    assert(pruned.inputFiles.length == 1,
      s"appended bounds must skip the base file: ${pruned.inputFiles.toSeq}")
    // CAS under contention: racing appends with retry lose no batch
    // and leave a gap-free metadata chain
    val batches = (0 until 6).map(i =>
      Seq((100L + i, 1000L + i)).toDF("id", "v").coalesce(1))
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        (0 until 3).foreach { i =>
          val b = batches(t * 3 + i)
          var done = false
          while (!done) {
            try { IcebergMeta.appendIcebergForeign(spark, root, b); done = true }
            catch { case _: java.util.ConcurrentModificationException => () }
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val after = IcebergMeta.readIceberg(spark, root)
      .as[(Long, Long)].collect().toSet
    assert((100L until 106L).forall(i => after.contains((i, i + 900L))),
      s"a racing append lost a committed batch: $after")
    val metaNs = Files.list(Paths.get(root, "metadata")).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
        n.stripPrefix("v").stripSuffix(".metadata.json").toLong }
      .toSeq.sorted
    assert(metaNs == (metaNs.head to metaNs.last),
      s"racing appends must leave a gap-free metadata chain: $metaNs")
    // refusals: schema mismatch; partitioned chain
    val exSchema = intercept[IllegalArgumentException] {
      IcebergMeta.appendIcebergForeign(spark, root,
        Seq((1, "x")).toDF("id", "s"))
    }
    assert(exSchema.getMessage.contains("does not match"), exSchema.getMessage)
  }

  test("iceberg foreign append under identity, day, and bucket specs; unknown transforms refuse") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, substring}
    val root = freshRoot("ice_append_part")
    LT.create(Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
      .repartition(col("cat")), root, partitionBy = Seq("cat"))
    IcebergMeta.exportIcebergMeta(spark, root)
    Files.walk(Paths.get(root, "_manifest")).iterator().asScala.toSeq
      .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    // a new partition value appends under the identity spec: hive
    // layout + a manifest partition struct carrying the value
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((3L, "c"), (4L, "a")).toDF("id", "cat").repartition(col("cat")))
    val back = IcebergMeta.readIceberg(spark, root)
    assert(back.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "a")))
    // the appended struct values PRUNE like the export's own: 'c'
    // exists only in the appended commit
    val pruned = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("cat = 'c'"))
    assert(pruned.select($"id").as[Long].collect().toSet == Set(3L))
    assert(pruned.inputFiles.length == 1,
      s"the appended partition must plan ONE file: ${pruned.inputFiles.toSeq}")
    // an EVOLVED spec whose single field carries a non-positional
    // field-id: the appended manifest's partition struct must write
    // the spec's DECLARED id (an id-resolving reader would read the
    // value as null under a positional 1000)
    val md = new com.fasterxml.jackson.databind.ObjectMapper()
    val dir = Paths.get(root, "metadata")
    val hint = Files.readString(dir.resolve("version-hint.text")).trim
    val mf = dir.resolve(s"v$hint.metadata.json")
    val node = md.readTree(Files.readString(mf))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.get("partition-specs").elements().asScala.foreach { spec =>
      spec.get("fields").elements().asScala.foreach { f =>
        f.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("field-id", 1007)
        ()
      }
    }
    Files.writeString(mf, node.toString)
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((5L, "e")).toDF("id", "cat").repartition(col("cat")))
    val tip = IcebergMeta.snapshots(root).last
    val appendManifest = new org.apache.avro.file.DataFileReader(
      Paths.get(new org.apache.avro.file.DataFileReader(
        Paths.get(tip.manifestList).toFile,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
        .iterator().asScala.toSeq.last
        .get("manifest_path").toString).toFile,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val partFieldId = appendManifest.getSchema
      .getField("data_file").schema()
      .getField("partition").schema()
      .getFields.get(0).getObjectProp("field-id")
    appendManifest.close()
    assert(partFieldId.toString == "1007",
      s"the appended struct must carry the spec's DECLARED id: $partFieldId")

    // a day(ts) TRANSFORM spec appends too — the append shape real
    // pipelines commit daily: the writer EVALUATES the transform per
    // row (UTC epoch arithmetic) and the appended struct values prune
    val troot = freshRoot("ice_append_day")
    def at(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    transformChain(troot,
      Seq((1L, at("2024-01-01T06:00:00Z")), (2L, at("2024-01-02T06:00:00Z")))
        .toDF("id", "ts")
        .withColumn("ts_day", expr("date_from_unix_date(CAST(" +
          "floor(unix_micros(ts) / 86400000000) AS INT))")),
      "ts_day", "day", "ts")
    IcebergMeta.appendIcebergForeign(spark, troot,
      Seq((3L, at("2024-01-02T18:00:00Z")), (4L, at("2024-01-03T06:00:00Z")))
        .toDF("id", "ts"))
    val dayBack = IcebergMeta.readIceberg(spark, troot)
    assert(dayBack.select($"id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
    // the appended files' day values derive pruning: day 3 exists only
    // in the appended commit; day 2 spans a base and an appended file
    val day3 = IcebergMeta.readIceberg(spark, troot, pruneWhere = Some(
      "ts >= TIMESTAMP '2024-01-03 00:00:00' AND " +
        "ts < TIMESTAMP '2024-01-04 00:00:00'"))
    assert(day3.select($"id").as[Long].collect().toSet == Set(4L))
    assert(day3.inputFiles.length == 1,
      s"the appended day must plan ONE file: ${day3.inputFiles.toSeq}")
    val day2 = IcebergMeta.readIceberg(spark, troot, pruneWhere = Some(
      "ts >= TIMESTAMP '2024-01-02 00:00:00' AND " +
        "ts < TIMESTAMP '2024-01-03 00:00:00'"))
    assert(day2.select($"id").as[Long].collect().toSet == Set(2L, 3L))
    assert(day2.inputFiles.length == 2,
      s"base + appended day-2 files: ${day2.inputFiles.toSeq}")

    // a BUCKET spec appends with the spec's own murmur3 placement: the
    // appended key must plan (and serve) from its single bucket file
    val broot = freshRoot("ice_append_bucket")
    val bucketOf = org.apache.spark.sql.functions.udf((k: java.lang.Long) =>
      Integer.valueOf((IcebergTransforms.bucketHashLong(k.longValue())
        & Int.MaxValue) % 4))
    transformChain(broot, (1L to 20L).map(k => (k, k * 10)).toDF("k", "v")
      .withColumn("kb", bucketOf(col("k"))),
      "kb", "bucket[4]", "k")
    IcebergMeta.appendIcebergForeign(spark, broot,
      Seq((21L, 210L), (22L, 220L)).toDF("k", "v")
        .repartition(col("k")))
    val b21 = IcebergMeta.readIceberg(spark, broot,
      pruneWhere = Some("k = 21"))
    assert(b21.select($"v").as[Long].collect().toSeq == Seq(210L))
    assert(b21.inputFiles.length <= 2,
      s"only bucket(21)'s base + appended files: ${b21.inputFiles.toSeq}")

    // TRUNCATE appends, both arms: int ranges (incl. a negative key,
    // where the floored mod matters) and string prefixes
    val tiroot = freshRoot("ice_append_trunc_int")
    transformChain(tiroot, Seq(5L, 150L, -30L).map(k => (k, k * 2))
      .toDF("k", "v")
      .withColumn("k_t", expr("CAST(k - ((k % 100) + 100) % 100 AS BIGINT)")),
      "k_t", "truncate[100]", "k")
    IcebergMeta.appendIcebergForeign(spark, tiroot,
      Seq((250L, 500L), (-150L, -300L)).toDF("k", "v")
        .repartition(col("k")))
    val ti = IcebergMeta.readIceberg(spark, tiroot,
      pruneWhere = Some("k >= 200 AND k <= 299"))
    assert(ti.select($"k").as[Long].collect().toSet == Set(250L))
    assert(ti.inputFiles.length == 1, ti.inputFiles.toSeq.toString)
    val tneg = IcebergMeta.readIceberg(spark, tiroot,
      pruneWhere = Some("k = -150"))
    assert(tneg.select($"v").as[Long].collect().toSeq == Seq(-300L))
    assert(tneg.inputFiles.length == 1,
      s"the floored negative bucket [-200,-101]: ${tneg.inputFiles.toSeq}")

    val tsroot = freshRoot("ice_append_trunc_str")
    transformChain(tsroot, Seq((1L, "apple"), (2L, "banana")).toDF("id", "s")
      .withColumn("s_t", substring(col("s"), 1, 2)),
      "s_t", "truncate[2]", "s")
    IcebergMeta.appendIcebergForeign(spark, tsroot,
      Seq((3L, "cherry"), (4L, "apricot")).toDF("id", "s")
        .repartition(col("s")))
    val tstr = IcebergMeta.readIceberg(spark, tsroot,
      pruneWhere = Some("s = 'cherry'"))
    assert(tstr.select($"id").as[Long].collect().toSet == Set(3L))
    assert(tstr.inputFiles.length == 1, tstr.inputFiles.toSeq.toString)
    // '' is unrepresentable in the hive layout: refuse, never mis-prune
    val exEmpty = intercept[IllegalArgumentException] {
      IcebergMeta.appendIcebergForeign(spark, tsroot,
        Seq((5L, "")).toDF("id", "s"))
    }
    assert(exEmpty.getMessage.contains("empty-string"), exEmpty.getMessage)

    // an UNKNOWN transform still refuses
    val uroot = freshRoot("ice_append_unknown")
    transformChain(uroot, Seq((1L, 5L)).toDF("id", "x")
      .withColumn("xt", (col("x") * 0).cast("int")),
      "xt", "truncate[10]", "x")
    val umf = Paths.get(uroot, "metadata")
    val uhint = Files.readString(umf.resolve("version-hint.text")).trim
    val un = Files.readString(umf.resolve(s"v$uhint.metadata.json"))
      .replace("\"transform\":\"truncate[10]\"", "\"transform\":\"zorder\"")
    Files.writeString(umf.resolve(s"v$uhint.metadata.json"), un)
    val exU = intercept[IllegalArgumentException] {
      IcebergMeta.appendIcebergForeign(spark, uroot,
        Seq((2L, 6L)).toDF("id", "x"))
    }
    assert(exU.getMessage.contains("unsupported transform"), exU.getMessage)
  }

  test("iceberg foreign append: refs.main advances, v1 refuses, empty chain gets a first snapshot") {
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // refs.main: doctor the chain to carry a branch ref (real Iceberg
    // >= 0.14 always does) — the commit must advance it or spec
    // readers reject the metadata outright
    val root = freshRoot("ice_refs")
    LT.create(Seq((1L, 10L)).toDF("id", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    val dir = Paths.get(root, "metadata")
    def md(n: Long) = mapper.readTree(
      Files.readString(dir.resolve(s"v$n.metadata.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val hint = Files.readString(dir.resolve("version-hint.text")).trim.toLong
    val cur = md(hint)
    val refs = mapper.createObjectNode()
    val main = mapper.createObjectNode()
    main.put("snapshot-id", cur.get("current-snapshot-id").asLong())
    main.put("type", "branch")
    refs.set("main", main)
    cur.set("refs", refs)
    Files.writeString(dir.resolve(s"v$hint.metadata.json"), cur.toString)
    val sid = IcebergMeta.appendIcebergForeign(spark, root,
      Seq((2L, 20L)).toDF("id", "v").coalesce(1))
    val after = md(hint + 1)
    assert(after.get("refs").get("main").get("snapshot-id").asLong() == sid,
      "the main branch ref must advance with current-snapshot-id")
    // format-version 1 refuses loudly (v1 lacks sequence numbers)
    val v1 = md(hint + 1)
    v1.put("format-version", 1)
    Files.writeString(dir.resolve(s"v${hint + 2}.metadata.json"),
      v1.toString)
    val ex = intercept[IllegalArgumentException] {
      IcebergMeta.appendIcebergForeign(spark, root,
        Seq((3L, 30L)).toDF("id", "v").coalesce(1))
    }
    assert(ex.getMessage.contains("format-version"), ex.getMessage)

    // an EMPTY foreign chain (freshly created table, no snapshots —
    // current-snapshot-id -1): the append commits a parentless first
    // snapshot instead of crashing on a missing parent
    val eroot = freshRoot("ice_empty")
    val edir = Paths.get(eroot, "metadata")
    Files.createDirectories(edir)
    Files.createDirectories(Paths.get(eroot, "data"))
    val schema = """{"type":"struct","schema-id":0,"fields":[
      {"id":1,"name":"id","required":false,"type":"long"},
      {"id":2,"name":"v","required":false,"type":"long"}]}"""
      .replaceAll("\n\\s*", "")
    Files.writeString(edir.resolve("v1.metadata.json"),
      s"""{"format-version":2,"table-uuid":"00000000-0000-0000-0000-000000000001",
         "location":"$eroot","last-sequence-number":0,"last-updated-ms":1,
         "last-column-id":2,"current-schema-id":0,"schemas":[$schema],
         "default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         "last-partition-id":999,"default-sort-order-id":0,
         "sort-orders":[{"order-id":0,"fields":[]}],"properties":{},
         "current-snapshot-id":-1,"snapshots":[],"snapshot-log":[],
         "metadata-log":[]}""".replaceAll("\n\\s*", ""))
    Files.writeString(edir.resolve("version-hint.text"), "1")
    IcebergMeta.appendIcebergForeign(spark, eroot,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1))
    assert(IcebergMeta.readIceberg(spark, eroot)
      .as[(Long, Long)].collect().toSet == Set((1L, 10L), (2L, 20L)))
  }

  test("iceberg foreign append keeps existing position deletes applying to old files") {
    import spark.implicits._
    val root = freshRoot("ice_append_mor")
    LT.create((1L to 10L).map(i => (i, i * 10)).toDF("id", "v")
      .coalesce(1), root)
    LT.deleteWhereMor(spark, root, "id <= 3")
    IcebergMeta.exportIcebergMeta(spark, root)
    assert(IcebergMeta.readIceberg(spark, root)
      .as[(Long, Long)].collect().map(_._1).toSet == (4L to 10L).toSet)
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((2L, 999L)).toDF("id", "v").coalesce(1))
    // the OLD file's id=2 stays MOR-deleted (delete seq < new data
    // seq never applies to the appended file), the NEW id=2 row serves
    val rows = IcebergMeta.readIceberg(spark, root)
      .as[(Long, Long)].collect().toSet
    assert(rows == (4L to 10L).map(i => (i, i * 10)).toSet + ((2L, 999L)),
      rows.toString)
  }

  test("transform pruning reaches the SQL face through iceberg_export_where") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val day = operators.Lakehouse.eventsDayChainRoot(spark, d)
    val pred = "ts >= TIMESTAMP ''2024-01-10 00:00:00'' AND " +
      "ts < TIMESTAMP ''2024-01-12 00:00:00''"
    val rows = graft.sql.GraftSql.sql(spark,
      s"SELECT event_id FROM iceberg_export_where('$day', '$pred')")
    val want = sources.Tables.events(spark, d)
      .filter(col("ts") >= "2024-01-10" && col("ts") < "2024-01-12")
      .select($"event_id").as[Long].collect().toSet
    assert(rows.as[Long].collect().toSet == want)
    assert(rows.inputFiles.length == 2,
      s"the SQL face must plan the same 2 daily files: " +
        rows.inputFiles.toSeq)
  }

  test("foreign appends are visible to both export streaming sources") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    def wipeManifest(root: String): Unit =
      Files.walk(Paths.get(root, "_manifest")).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(Files.deleteIfExists(_))
    def tail(root: String, fmt: String,
        append: () => Unit): Set[(Long, Long)] = {
      val ckpt = Files.createTempDirectory("r13-stream-ckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val q = spark.readStream.format(fmt).option("path", root).load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            b.collect().foreach(r =>
              seen.add((r.getLong(0), r.getLong(1)))); ()
        }.start()
      q.processAllAvailable()
      append() // the FOREIGN commit, while the stream is running
      q.processAllAvailable()
      q.stop()
      seen.asScala.toSet
    }
    val droot = freshForeign("stream_fa")
    wipeManifest(droot)
    val dseen = tail(droot, "delta-export", () => {
      LT.appendDeltaForeign(spark, droot,
        Seq((2L, 20L), (3L, 30L)).toDF("id", "v").coalesce(1)); ()
    })
    assert(dseen == Set((1L, 10L), (2L, 20L), (3L, 30L)),
      s"the delta-export tail must see the foreign append: $dseen")

    val iroot = freshRoot("stream_ice_fa")
    LT.create(Seq((1L, 10L)).toDF("id", "v").coalesce(1), iroot)
    IcebergMeta.exportIcebergMeta(spark, iroot)
    wipeManifest(iroot)
    val iseen = tail(iroot, "iceberg-export", () => {
      IcebergMeta.appendIcebergForeign(spark, iroot,
        Seq((2L, 20L), (3L, 30L)).toDF("id", "v").coalesce(1)); ()
    })
    assert(iseen == Set((1L, 10L), (2L, 20L), (3L, 30L)),
      s"the iceberg-export tail must see the foreign append: $iseen")
  }

  test("q208/q209 fixtures plan the pinned delta file subsets at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val hive = operators.Lakehouse.ordersHivePartRoot(spark, d)
    assert(LT.readDeltaExport(spark, hive).inputFiles.length == 3)
    val pPruned = LT.readDeltaExport(spark, hive,
      pruneWhere = Some("o_orderstatus = 'F'"))
    assert(pPruned.inputFiles.length == 1,
      s"one status partition file: ${pPruned.inputFiles.toSeq}")

    // the PARTITIONED appended log: 3 base + 3 appended status files;
    // a partition predicate plans exactly the status's two (base +
    // appended — the appended adds' partitionValues prune too)
    val part = operators.Lakehouse.foreignPartAppendRoot(spark, d)
    assert(LT.readDeltaExport(spark, part).inputFiles.length == 6)
    val partPruned = LT.readDeltaExport(spark, part,
      pruneWhere = Some("o_orderstatus = 'F'"))
    assert(partPruned.inputFiles.length == 2,
      s"base + appended F files: ${partPruned.inputFiles.toSeq}")

    val ts = operators.Lakehouse.eventsTsChainRoot(spark, d)
    assert(LT.readDeltaExport(spark, ts).inputFiles.length == 8)
    val tsPruned = LT.readDeltaExport(spark, ts, pruneWhere = Some(
      "ts >= TIMESTAMP '2024-01-10 00:00:00' AND " +
        "ts < TIMESTAMP '2024-01-12 00:00:00'"))
    // 2 of 30 days ≈ 1 of 8 contiguous time ranges (2 if straddling)
    assert(tsPruned.inputFiles.length <= 2,
      s"a 2-day window must plan at most 2 of 8 range files: " +
        tsPruned.inputFiles.toSeq)
  }

  test("partition evolution: each era plans under the spec it was written with") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val root = freshRoot("evolve_identity_to_day")
    // spec 0: identity(cat) — two category files, 2023 timestamps.
    // Identity layout keeps cat OUT of the data files, so the ONLY
    // cat-pruning information for this era is the partition struct.
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    LT.create(Seq(
        (1L, "a", ts("2023-06-01T10:00:00Z")),
        (2L, "a", ts("2023-06-02T10:00:00Z")),
        (3L, "b", ts("2023-06-01T11:00:00Z")))
      .toDF("k", "cat", "ts").repartition(col("cat")),
      root, partitionBy = Seq("cat"))
    IcebergMeta.exportIcebergMeta(spark, root)
    val specId = IcebergMeta.evolvePartitionSpecForeign(root,
      Seq(("ts_day", "day", "ts")))
    assert(specId == 1)
    // spec 1: day(ts) — two 2024 days appended under the new layout
    IcebergMeta.appendIcebergForeign(spark, root, Seq(
        (10L, "c", ts("2024-01-10T05:00:00Z")),
        (11L, "c", ts("2024-01-10T23:00:00Z")),
        (12L, "c", ts("2024-01-11T01:00:00Z")))
      .toDF("k", "cat", "ts")
      .repartition(expr("CAST(unix_micros(ts) DIV 86400000000 AS INT)")))
    val all = IcebergMeta.readIceberg(spark, root)
    assert(all.count() == 6)
    assert(all.inputFiles.length == 4, all.inputFiles.toSeq.toString)
    // OLD era: cat='a' resolves through spec 0's identity struct — one
    // of the two identity files; both appended files excluded (their
    // cat metrics say 'c')
    val oldEra = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("cat = 'a'"))
    assert(oldEra.select($"k").as[Long].collect().toSet == Set(1L, 2L))
    assert(oldEra.inputFiles.length == 1, oldEra.inputFiles.toSeq.toString)
    // NEW era: a one-day window resolves through spec 1's day values —
    // one of the two appended files; the 2023 identity files are
    // excluded by their ts metrics
    val newEra = IcebergMeta.readIceberg(spark, root, pruneWhere = Some(
      "ts >= TIMESTAMP '2024-01-11 00:00:00' AND " +
        "ts < TIMESTAMP '2024-01-12 00:00:00'"))
    assert(newEra.select($"k").as[Long].collect().toSet == Set(12L))
    assert(newEra.inputFiles.length == 1, newEra.inputFiles.toSeq.toString)
  }

  test("partition evolution: a field name reused with a different transform resolves per file") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, substring}
    // spec 0: truncate[2](s) named part_k; spec 1 REUSES the name
    // part_k as bucket[4](k) — name-level resolution refuses this
    // chain (ambiguous); field-id resolution serves both eras
    val root = freshRoot("evolve_name_reuse")
    transformChain(root, Seq((1L, "apple"), (2L, "banana")).toDF("k", "s")
      .withColumn("part_k", substring(col("s"), 1, 2)),
      "part_k", "truncate[2]", "s")
    val specId = IcebergMeta.evolvePartitionSpecForeign(root,
      Seq(("part_k", "bucket[4]", "k")))
    assert(specId == 1)
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((100L, "xigua"), (101L, "yam")).toDF("k", "s")
        .repartition(col("k")))
    val all = IcebergMeta.readIceberg(spark, root)
    assert(all.count() == 4)
    // old era: the truncate prefix still prunes (1 of 2 spec-0 files;
    // the appended files' s metrics exclude 'banana')
    val pre = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("s = 'banana'"))
    assert(pre.select($"k").as[Long].collect().toSet == Set(2L))
    assert(pre.inputFiles.length == 1, pre.inputFiles.toSeq.toString)
    // new era: k=100 plans exactly one appended file (bucket equality
    // re-hash + k metrics; the old era's k bounds exclude both files)
    val post = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("k = 100"))
    assert(post.select($"s").as[String].collect().toSeq == Seq("xigua"))
    assert(post.inputFiles.length == 1, post.inputFiles.toSeq.toString)
  }

  test("partition evolution: field-id reuse, refusals, and evolve-to-unpartitioned") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("evolve_rules")
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    LT.create(Seq((1L, "a", ts("2024-03-01T10:00:00Z")))
      .toDF("k", "cat", "ts").repartition(col("cat")),
      root, partitionBy = Seq("cat"))
    IcebergMeta.exportIcebergMeta(spark, root)
    // same (source, transform) across specs KEEPS its field-id
    IcebergMeta.evolvePartitionSpecForeign(root, Seq(("ts_day", "day", "ts")))
    IcebergMeta.evolvePartitionSpecForeign(root,
      Seq(("ts_day_again", "day", "ts")))
    val md = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(root,
        "metadata", "v3.metadata.json")))
    val dayFids = md.get("partition-specs").elements().asScala
      .flatMap(_.get("fields").elements().asScala)
      .filter(_.get("transform").asText() == "day")
      .map(_.get("field-id").asInt()).toSeq
    assert(dayFids.size == 2 && dayFids.distinct.size == 1,
      s"day(ts) must reuse one field-id across specs: $dayFids")
    assert(md.get("default-spec-id").asInt() == 2)
    // refusals: unknown transform, missing source, schema-column
    // shadowing, duplicate names, duplicate (source, transform)
    intercept[IllegalArgumentException] {
      IcebergMeta.evolvePartitionSpecForeign(root,
        Seq(("x", "zorder[2]", "k")))
    }
    intercept[IllegalArgumentException] {
      IcebergMeta.evolvePartitionSpecForeign(root,
        Seq(("x", "day", "nope")))
    }
    intercept[IllegalArgumentException] {
      IcebergMeta.evolvePartitionSpecForeign(root,
        Seq(("cat", "bucket[4]", "k"))) // shadows the schema column
    }
    intercept[IllegalArgumentException] {
      IcebergMeta.evolvePartitionSpecForeign(root,
        Seq(("x", "day", "ts"), ("x", "year", "ts")))
    }
    intercept[IllegalArgumentException] {
      IcebergMeta.evolvePartitionSpecForeign(root,
        Seq(("x", "day", "ts"), ("y", "day", "ts")))
    }
    // evolve to UNPARTITIONED and append: the appended file carries an
    // empty struct and the chain still serves both eras
    val unspec = IcebergMeta.evolvePartitionSpecForeign(root, Nil)
    assert(unspec == 3)
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((2L, "b", ts("2024-03-02T10:00:00Z"))).toDF("k", "cat", "ts"))
    val all = IcebergMeta.readIceberg(spark, root)
    assert(all.count() == 2)
    // the spec-0 identity value still prunes after two more evolutions
    val pruned = IcebergMeta.readIceberg(spark, root,
      pruneWhere = Some("cat = 'nope'"))
    assert(pruned.count() == 0)
    assert(pruned.inputFiles.length <= 1,
      s"the identity file is excluded by its struct; the unpartitioned " +
        s"appended file may only survive through its cat metrics: " +
        pruned.inputFiles.toSeq)
  }

  private def wipeManifest(root: String): Unit = {
    val walked = Files.walk(Paths.get(root, "_manifest"))
    try walked.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
    finally walked.close()
  }

  test("delta foreign delete: partial COW rewrite, stats, no-op, null semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fd_delta")
    LT.create(Seq.range(1L, 21L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    assert(LT.readDeltaExport(spark, root).inputFiles.length == 2)
    // only the file holding matching rows rewrites: stats plan one
    // candidate, the row pass confirms it
    val ver = LT.deleteDeltaForeign(spark, root, "k <= 5 AND k % 2 = 1")
    val logTxt = Files.readString(Paths.get(root, "_delta_log",
      f"$ver%020d.json"))
    assert(""""remove":""".r.findAllIn(logTxt).size == 1, logTxt)
    val back = LT.readDeltaExport(spark, root)
    assert(back.select($"k").as[Long].collect().toSet ==
      (1L to 20L).toSet -- Set(1L, 3L, 5L))
    // the rewritten file's fresh stats still plan
    val pruned = LT.readDeltaExport(spark, root,
      pruneWhere = Some("k <= 5"))
    assert(pruned.select($"k").as[Long].collect().toSet == Set(2L, 4L))
    assert(pruned.inputFiles.length == 1, pruned.inputFiles.toSeq.toString)
    // no matching row: NO commit (Delta's no-op DELETE shape)
    val same = LT.deleteDeltaForeign(spark, root, "k = 999")
    assert(same == ver)
    assert(!Files.exists(Paths.get(root, "_delta_log",
      f"${ver + 1}%020d.json")))
    // NULL-predicate rows are KEPT (SQL DELETE semantics)
    val nroot = freshRoot("fd_delta_null")
    LT.create(Seq((1L, Some(5L)), (2L, None), (3L, Some(20L)))
      .toDF("k", "v").coalesce(1), nroot)
    LT.exportDeltaLog(spark, nroot)
    wipeManifest(nroot)
    LT.deleteDeltaForeign(spark, nroot, "v > 4")
    assert(LT.readDeltaExport(spark, nroot)
      .select($"k").as[Long].collect().toSeq == Seq(2L))
  }

  test("delta foreign delete: existing deletion vectors do not resurrect; refusals") {
    import spark.implicits._
    val root = freshRoot("fd_delta_dv")
    LT.create(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("k", "v").coalesce(1), root)
    // a native MOR delete leaves k=2 under a deletion vector, exported
    // as a spec DV action on the single add
    LT.deleteWhereMor(spark, root, "k = 2")
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    assert(LT.readDeltaExport(spark, root)
      .select($"k").as[Long].collect().toSet == Set(1L, 3L, 4L))
    // the COW rewrite of the DV'd file must apply the DV: k=2 stays
    // deleted, k=3 leaves, k=1/4 survive
    val dvVer = LT.deleteDeltaForeign(spark, root, "k = 3")
    assert(LT.readDeltaExport(spark, root)
      .select($"k").as[Long].collect().toSet == Set(1L, 4L))
    // the spec's action reconciliation keys a logical file on
    // (path, deletionVector uniqueId): the remove must carry the add's
    // DV verbatim or conforming readers leave the removed file LIVE
    val dvLog = Files.readString(Paths.get(root, "_delta_log",
      f"$dvVer%020d.json"))
    val removeLine = dvLog.split('\n').find(_.contains("\"remove\""))
    assert(removeLine.exists(_.contains("\"deletionVector\"")),
      s"the remove must reference the add's DV: ${removeLine.getOrElse("")}")
    // every committed line is one valid JSON object (a control-char
    // predicate must not split the NDJSON)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    dvLog.split('\n').filter(_.nonEmpty).foreach(om.readTree)

    // a predicate with a raw newline inside its string literal commits
    // as ONE parseable commitInfo line
    val nlroot = freshRoot("fd_delta_nl")
    LT.create(Seq(("a\nb", 1L), ("c", 2L)).toDF("s", "v").coalesce(1),
      nlroot)
    LT.exportDeltaLog(spark, nlroot)
    wipeManifest(nlroot)
    val nlVer = LT.deleteDeltaForeign(spark, nlroot, "s = 'a\nb'")
    assert(LT.readDeltaExport(spark, nlroot)
      .select($"v").as[Long].collect().toSeq == Seq(2L))
    Files.readString(Paths.get(nlroot, "_delta_log",
      f"$nlVer%020d.json")).split('\n').filter(_.nonEmpty)
      .foreach(om.readTree)

    // refusals: an append-only table, a CDF-recording table
    val aroot = freshRoot("fd_delta_ao")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), aroot)
    LT.exportDeltaLog(spark, aroot)
    wipeManifest(aroot)
    val lf = Paths.get(aroot, "_delta_log", f"${0L}%020d.json")
    val doctored = Files.readString(lf).replace(
      """"configuration":{}""",
      """"configuration":{"delta.appendOnly":"true"}""")
    assert(doctored.contains("appendOnly"), "doctor must apply")
    Files.writeString(lf, doctored)
    val exAo = intercept[IllegalArgumentException] {
      LT.deleteDeltaForeign(spark, aroot, "k = 1")
    }
    assert(exAo.getMessage.contains("append-only"), exAo.getMessage)

    // a CDF-recording table gets REAL cdc actions: table_changes for
    // the delete version is exactly the deleted rows
    val croot = freshRoot("fd_delta_cdf")
    LT.create(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .coalesce(1), croot)
    LT.enableChangeDataFeed(spark, croot, Seq("k"))
    LT.exportDeltaLog(spark, croot)
    wipeManifest(croot)
    val cdfVer = LT.deleteDeltaForeign(spark, croot, "k = 2")
    assert(LT.readDeltaExport(spark, croot)
      .select($"k").as[Long].collect().toSet == Set(1L, 3L))
    val changes = LT.readDeltaExportChanges(spark, croot, cdfVer, cdfVer)
    assert(changes.select($"_change_type", $"k").as[(String, Long)]
      .collect().toSeq == Seq(("delete", 2L)),
      "the delete version's change set must be exactly the deleted rows")

    // ... but CDF under COLUMN MAPPING refuses (change files follow the
    // data files' physical-space rules this writer lays out logically)
    val mroot = freshRoot("fd_delta_cdf_mapped")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), mroot)
    LT.alterRenameColumn(spark, mroot, "v", "val")
    LT.enableChangeDataFeed(spark, mroot, Seq("k"))
    LT.exportDeltaLog(spark, mroot)
    wipeManifest(mroot)
    val exCdf = intercept[IllegalArgumentException] {
      LT.deleteDeltaForeign(spark, mroot, "k = 1")
    }
    assert(exCdf.getMessage.contains("column mapping"), exCdf.getMessage)
  }

  test("delta foreign delete under column mapping rewrites in physical space") {
    import spark.implicits._
    val root = freshRoot("fd_delta_mapped")
    LT.create(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
      .coalesce(1), root)
    LT.alterRenameColumn(spark, root, "v", "val")
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    // the predicate speaks LOGICAL names; the rewrite lands physical
    val ver = LT.deleteDeltaForeign(spark, root, "val = 20")
    val back = LT.readDeltaExport(spark, root)
    assert(back.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (3L, 30L)))
    // the rewritten footer carries the PHYSICAL pre-rename name
    val logTxt = Files.readString(Paths.get(root, "_delta_log",
      f"$ver%020d.json"))
    val addPath = """"path":"data/([^"]+)"""".r
      .findFirstMatchIn(logTxt).map(_.group(1))
    assert(addPath.isDefined, logTxt.take(300))
    val footCols = {
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(
            Paths.get(root, "data", addPath.get).toString),
          new org.apache.hadoop.conf.Configuration()))
      try rd.getFooter.getFileMetaData.getSchema.getFields
        .asScala.map(_.getName).toSeq
      finally rd.close()
    }
    assert(footCols.contains("v") && !footCols.contains("val"),
      s"rewritten data must use PHYSICAL column names: $footCols")
  }

  private def currentIceSnapshot(root: String): Long = {
    val dir = Paths.get(root, "metadata")
    val hint = Files.readString(dir.resolve("version-hint.text")).trim
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(dir.resolve(s"v$hint.metadata.json")))
      .get("current-snapshot-id").asLong()
  }

  private def maxIceVersion(root: String): Long = {
    val listed = Files.list(Paths.get(root, "metadata"))
    try listed.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
        n.stripPrefix("v").stripSuffix(".metadata.json").toLong }
      .max
    finally listed.close()
  }

  test("iceberg foreign delete: MOR position deletes, time travel, layering, no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fd_ice")
    LT.create(Seq.range(1L, 11L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    val parent = currentIceSnapshot(root)
    val sid = IcebergMeta.deleteIcebergForeign(spark, root,
      "k <= 5 AND k % 2 = 1")
    assert(sid != parent)
    val all = IcebergMeta.readIceberg(spark, root)
    assert(all.select($"k").as[Long].collect().toSet ==
      (1L to 10L).toSet -- Set(1L, 3L, 5L))
    // MERGE-ON-READ: no data file rewritten — both still serve (the
    // third input is the delete parquet the anti-join reads)
    assert(all.inputFiles.count(_.contains("/data/")) == 2,
      all.inputFiles.toSeq.toString)
    // time travel to the parent serves the pre-delete rows
    val past = IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(parent))
    assert(past.count() == 10)
    // a second delete LAYERS on the carried one
    IcebergMeta.deleteIcebergForeign(spark, root, "k = 7")
    assert(IcebergMeta.readIceberg(spark, root)
      .select($"k").as[Long].collect().toSet ==
      Set(2L, 4L, 6L, 8L, 9L, 10L))
    // planning keeps the file of a deleted key; the read serves 0 rows
    val p = IcebergMeta.readIceberg(spark, root, pruneWhere = Some("k = 3"))
    assert(p.count() == 0)
    // no matching row: NO new metadata version
    val verBefore = maxIceVersion(root)
    IcebergMeta.deleteIcebergForeign(spark, root, "k = 999")
    assert(maxIceVersion(root) == verBefore)
    // a predicate over an unknown column refuses
    intercept[IllegalArgumentException] {
      IcebergMeta.deleteIcebergForeign(spark, root, "nope = 1")
    }
  }

  test("delta foreign update: conditional rewrite, types, null guard, no-op, CDF") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fu_delta")
    LT.create(Seq.range(1L, 21L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    // only the file holding matching rows rewrites; non-matching rows
    // of that file pass through verbatim
    val ver = LT.updateDeltaForeign(spark, root, "k <= 5",
      Map("v" -> "v + 100"))
    val logTxt = Files.readString(Paths.get(root, "_delta_log",
      f"$ver%020d.json"))
    assert(""""remove":""".r.findAllIn(logTxt).size == 1, logTxt)
    val back = LT.readDeltaExport(spark, root)
      .as[(Long, Long)].collect().toMap
    assert((1L to 20L).forall(k =>
      back(k) == (if (k <= 5) k * 10 + 100 else k * 10)), back.toString)
    // SET must resolve to the column's EXACT type
    val exType = intercept[IllegalArgumentException] {
      LT.updateDeltaForeign(spark, root, "k = 1", Map("v" -> "'abc'"))
    }
    assert(exType.getMessage.contains("resolves to"), exType.getMessage)
    // a ghost SET column refuses
    intercept[IllegalArgumentException] {
      LT.updateDeltaForeign(spark, root, "k = 1", Map("nope" -> "1"))
    }
    // no matching row: no commit
    val same = LT.updateDeltaForeign(spark, root, "k = 999",
      Map("v" -> "v"))
    assert(same == ver)
    assert(!Files.exists(Paths.get(root, "_delta_log",
      f"${ver + 1}%020d.json")))
    // a NULL produced for a NON-NULLABLE column fails BEFORE commit
    // (the export writes nullable schemas; doctor v to nullable=false,
    // the foreign-nullability shape the append test pins)
    val lf0 = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    Files.writeString(lf0, Files.readString(lf0).replace(
      """{\"name\":\"v\",\"type\":\"long\",\"nullable\":true""",
      """{\"name\":\"v\",\"type\":\"long\",\"nullable\":false"""))
    assert(Files.readString(lf0).contains("""\"nullable\":false"""))
    val exNull = intercept[Exception] {
      LT.updateDeltaForeign(spark, root, "k = 2",
        Map("v" -> "IF(k = 2, CAST(NULL AS BIGINT), v)"))
    }
    assert(exNull.getMessage != null &&
      (exNull.getMessage.contains("non-nullable") ||
        Option(exNull.getCause).exists(
          _.getMessage.contains("non-nullable"))),
      s"${exNull.getMessage}")
    assert(!Files.exists(Paths.get(root, "_delta_log",
      f"${ver + 1}%020d.json")), "a failed rewrite must not commit")
    // CHECK constraints refuse (doctored conf, the appendOnly pattern)
    val crroot = freshRoot("fu_delta_ck")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), crroot)
    LT.exportDeltaLog(spark, crroot)
    wipeManifest(crroot)
    val lf = Paths.get(crroot, "_delta_log", f"${0L}%020d.json")
    val doctored = Files.readString(lf).replace(
      """"configuration":{}""",
      """"configuration":{"delta.constraints.c1":"v > 0"}""")
    assert(doctored.contains("constraints"), "doctor must apply")
    Files.writeString(lf, doctored)
    val exCk = intercept[IllegalArgumentException] {
      LT.updateDeltaForeign(spark, crroot, "k = 1", Map("v" -> "v"))
    }
    assert(exCk.getMessage.contains("CHECK"), exCk.getMessage)
    // ... while the DELETE still accepts the same table (row subset)
    assert(LT.deleteDeltaForeign(spark, crroot, "k = 999") >= 0)

    // CDF: the update version's change set is the preimage/postimage
    // pair of exactly the matched rows
    val croot = freshRoot("fu_delta_cdf")
    LT.create(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .coalesce(1), croot)
    LT.enableChangeDataFeed(spark, croot, Seq("k"))
    LT.exportDeltaLog(spark, croot)
    wipeManifest(croot)
    val cdfVer = LT.updateDeltaForeign(spark, croot, "k = 2",
      Map("v" -> "v * 2"))
    val changes = LT.readDeltaExportChanges(spark, croot, cdfVer, cdfVer)
      .select($"_change_type", $"k", $"v").as[(String, Long, Long)]
      .collect().toSet
    assert(changes == Set(("update_preimage", 2L, 20L),
      ("update_postimage", 2L, 40L)), changes.toString)
  }

  test("delta foreign update relocates rows when a partition column changes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fu_delta_part")
    LT.create(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "cat")
      .repartition(col("cat")), root, partitionBy = Seq("cat"))
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    LT.updateDeltaForeign(spark, root, "k = 2", Map("cat" -> "'c'"))
    val back = LT.readDeltaExport(spark, root)
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a"), (2L, "c"), (3L, "b")))
    // the relocated row lives under its NEW hive dir and its add's
    // partitionValues prune
    val pruned = LT.readDeltaExport(spark, root,
      pruneWhere = Some("cat = 'c'"))
    assert(pruned.as[(Long, String)].collect().toSet == Set((2L, "c")))
    assert(pruned.inputFiles.length == 1, pruned.inputFiles.toSeq.toString)
    assert(pruned.inputFiles.head.contains("cat=c"),
      pruned.inputFiles.head)
  }

  test("repetition stats: edge docs match the oracle conventions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the fixture corpus has no empty/whitespace-edge/null docs — pin
    // the parity rules here: trim + \s+ + empty-token filter, missing
    // grams count 0, NULL text stays NULL (nullSafeEval)
    val rows = Seq((0L, "a b a b a"), (2L, ""), (3L, "\tx y\n"),
        (4L, "solo"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.plans.TextExpressions.repetitionStats(col("text")).as("r"))
      .orderBy("doc_id")
      .select(col("doc_id"), col("r")(0), col("r")(1), col("r")(2),
        col("r")(3))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 5L, 4L, 2L, 3L), (2L, 0L, 0L, 0L, 0L),
      (3L, 2L, 2L, 0L, 0L), (4L, 1L, 0L, 0L, 0L)))
    val nullRow = Seq((1L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(graft.plans.TextExpressions.repetitionStats(col("text"))
        .as("r")).collect()
    assert(nullRow.head.isNullAt(0), "null text must yield null signals")
  }

  test("iceberg foreign update: one MOR snapshot, no resurrection, relocation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fu_ice")
    LT.create(Seq.range(1L, 11L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    val parent = currentIceSnapshot(root)
    // a prior MOR delete: k=2 is gone; the update below must NOT
    // resurrect it as an updated copy (existing deletes apply first)
    IcebergMeta.deleteIcebergForeign(spark, root, "k = 2")
    val sid = IcebergMeta.updateIcebergForeign(spark, root, "k <= 3",
      Map("v" -> "v + 100"))
    val back = IcebergMeta.readIceberg(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(!back.contains(2L), "the deleted row must stay deleted")
    assert((1L to 10L).filter(_ != 2L).forall(k =>
      back(k) == (if (k <= 3) k * 10 + 100 else k * 10)), back.toString)
    // ONE snapshot committed both manifests: version count grew by 2
    // total (delete + update), and time travel sees each state
    assert(IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(parent)).count() == 10)
    assert(sid == currentIceSnapshot(root))
    // type / ghost / no-op contracts
    intercept[IllegalArgumentException] {
      IcebergMeta.updateIcebergForeign(spark, root, "k = 1",
        Map("v" -> "'abc'"))
    }
    intercept[IllegalArgumentException] {
      IcebergMeta.updateIcebergForeign(spark, root, "k = 1",
        Map("nope" -> "1"))
    }
    val verBefore = maxIceVersion(root)
    IcebergMeta.updateIcebergForeign(spark, root, "k = 999",
      Map("v" -> "v"))
    assert(maxIceVersion(root) == verBefore)

    // SET on an identity partition SOURCE relocates the row: the
    // updated copy lands under the new hive dir and its struct prunes
    val proot = freshRoot("fu_ice_part")
    LT.create(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "cat")
      .repartition(col("cat")), proot, partitionBy = Seq("cat"))
    IcebergMeta.exportIcebergMeta(spark, proot)
    wipeManifest(proot)
    IcebergMeta.updateIcebergForeign(spark, proot, "k = 2",
      Map("cat" -> "'c'"))
    assert(IcebergMeta.readIceberg(spark, proot)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "c"), (3L, "b")))
    val pruned = IcebergMeta.readIceberg(spark, proot,
      pruneWhere = Some("cat = 'c'"))
    assert(pruned.as[(Long, String)].collect().toSet == Set((2L, "c")))
    assert(pruned.inputFiles.count(_.contains("/data/")) == 1,
      pruned.inputFiles.toSeq.toString)
    assert(pruned.inputFiles.exists(_.contains("cat=c")),
      pruned.inputFiles.toSeq.toString)
  }

  test("delta foreign merge: partial rewrite, inserts, delete clause, no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fm_delta")
    LT.create(Seq.range(1L, 21L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    // source keys all land in file 1 (k ≤ 10) plus one insert: ONLY
    // that file rewrites (key-bounds planning + exact matched pass)
    val ver = LT.mergeDeltaForeign(spark, root,
      Seq((2L, 999L), (21L, 210L)).toDF("k", "v"), Seq("k"))
    val logTxt = Files.readString(Paths.get(root, "_delta_log",
      f"$ver%020d.json"))
    assert(""""remove":""".r.findAllIn(logTxt).size == 1, logTxt)
    val back = LT.readDeltaExport(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(back.size == 21 && back(2L) == 999L && back(21L) == 210L &&
      back(1L) == 10L && back(20L) == 200L, back.toString)
    // the delete clause removes its keys; a key in BOTH sets takes the
    // update (the upsert's post-image is the net state)
    val ver2 = LT.mergeDeltaForeign(spark, root,
      Seq((3L, 333L)).toDF("k", "v"), Seq("k"),
      deleteKeys = Some(Seq(Tuple1(4L), Tuple1(3L)).toDF("k")))
    assert(ver2 == ver + 1)
    val back2 = LT.readDeltaExport(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(!back2.contains(4L) && back2(3L) == 333L && back2.size == 20,
      back2.toString)
    // an empty source is a no-op: no version committed
    val same = LT.mergeDeltaForeign(spark, root,
      Seq.empty[(Long, Long)].toDF("k", "v"), Seq("k"))
    assert(same == ver2)
    assert(!Files.exists(Paths.get(root, "_delta_log",
      f"${ver2 + 1}%020d.json")))
    // an insert-only merge (nothing matches) commits adds, no removes
    val ver3 = LT.mergeDeltaForeign(spark, root,
      Seq((100L, 1000L)).toDF("k", "v"), Seq("k"))
    val log3 = Files.readString(Paths.get(root, "_delta_log",
      f"$ver3%020d.json"))
    assert(!log3.contains(""""remove":""") && log3.contains(""""add":"""),
      log3)
    // duplicate source keys refuse (Delta MERGE's multiple-match error)
    val exDup = intercept[IllegalArgumentException] {
      LT.mergeDeltaForeign(spark, root,
        Seq((5L, 1L), (5L, 2L)).toDF("k", "v"), Seq("k"))
    }
    assert(exDup.getMessage.contains("duplicate key"), exDup.getMessage)
    // schema mismatch refuses; ghost key refuses
    intercept[IllegalArgumentException] {
      LT.mergeDeltaForeign(spark, root,
        Seq((5L, "x")).toDF("k", "v"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      LT.mergeDeltaForeign(spark, root,
        Seq((5L, 1L)).toDF("k", "v"), Seq("nope"))
    }
  }

  test("delta foreign merge: null-safe keys and CDF classification") {
    import spark.implicits._
    // a NULL key matches the existing NULL-key row (or repeated merges
    // would duplicate it forever)
    val nroot = freshRoot("fm_delta_null")
    LT.create(Seq((Option(1L), 10L), (None, 99L))
      .toDF("k", "v").coalesce(1), nroot)
    LT.exportDeltaLog(spark, nroot)
    wipeManifest(nroot)
    LT.mergeDeltaForeign(spark, nroot,
      Seq((None: Option[Long], 100L)).toDF("k", "v"), Seq("k"))
    val nback = LT.readDeltaExport(spark, nroot)
      .as[(Option[Long], Long)].collect().toSet
    assert(nback == Set((Some(1L), 10L), (None, 100L)), nback.toString)

    // CDF: the merge version's change set carries Delta MERGE's real
    // classification — preimage/postimage, insert, delete
    val croot = freshRoot("fm_delta_cdf")
    LT.create(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .coalesce(1), croot)
    LT.enableChangeDataFeed(spark, croot, Seq("k"))
    LT.exportDeltaLog(spark, croot)
    wipeManifest(croot)
    val cdfVer = LT.mergeDeltaForeign(spark, croot,
      Seq((2L, 40L), (4L, 44L)).toDF("k", "v"), Seq("k"),
      deleteKeys = Some(Seq(Tuple1(3L)).toDF("k")))
    val changes = LT.readDeltaExportChanges(spark, croot, cdfVer, cdfVer)
      .select($"_change_type", $"k", $"v").as[(String, Long, Long)]
      .collect().toSet
    assert(changes == Set(
      ("update_preimage", 2L, 20L), ("update_postimage", 2L, 40L),
      ("insert", 4L, 44L), ("delete", 3L, 30L)), changes.toString)
  }

  test("iceberg foreign merge: one MOR snapshot, inserts, no resurrection, no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fm_ice")
    LT.create(Seq.range(1L, 11L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    val parent = currentIceSnapshot(root)
    // a prior MOR delete: k=2 is invisible, so the merge INSERTS its
    // source row as a fresh key instead of resurrecting + updating
    IcebergMeta.deleteIcebergForeign(spark, root, "k = 2")
    val sid = IcebergMeta.mergeIcebergForeign(spark, root,
      Seq((2L, 222L), (3L, 333L), (11L, 110L)).toDF("k", "v"), Seq("k"))
    assert(sid == currentIceSnapshot(root))
    val back = IcebergMeta.readIceberg(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(back.size == 11 && back(2L) == 222L && back(3L) == 333L &&
      back(11L) == 110L && back(1L) == 10L && back(10L) == 100L,
      back.toString)
    // no base data file was rewritten: both original files still serve
    val dataFiles = IcebergMeta.readIceberg(spark, root).inputFiles
      .filter(_.contains("/data/"))
    assert(dataFiles.length >= 3, dataFiles.toSeq.toString)
    // time travel to the pre-delete parent serves the original rows
    assert(IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(parent)).count() == 10)
    // the delete clause removes MOR-style; update wins on a shared key
    IcebergMeta.mergeIcebergForeign(spark, root,
      Seq((5L, 555L)).toDF("k", "v"), Seq("k"),
      deleteKeys = Some(Seq(Tuple1(6L), Tuple1(5L)).toDF("k")))
    val back2 = IcebergMeta.readIceberg(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(!back2.contains(6L) && back2(5L) == 555L, back2.toString)
    // empty source: no-op, no metadata version
    val verBefore = maxIceVersion(root)
    IcebergMeta.mergeIcebergForeign(spark, root,
      Seq.empty[(Long, Long)].toDF("k", "v"), Seq("k"))
    assert(maxIceVersion(root) == verBefore)
    // nothing matches: the merge commits a plain append
    IcebergMeta.mergeIcebergForeign(spark, root,
      Seq((200L, 2000L)).toDF("k", "v"), Seq("k"))
    assert(IcebergMeta.readIceberg(spark, root)
      .filter($"k" === 200L).count() == 1)
    // duplicate source keys refuse
    val exDup = intercept[IllegalArgumentException] {
      IcebergMeta.mergeIcebergForeign(spark, root,
        Seq((5L, 1L), (5L, 2L)).toDF("k", "v"), Seq("k"))
    }
    assert(exDup.getMessage.contains("duplicate key"), exDup.getMessage)
  }

  test("delta foreign maintenance: checkpoint, log cleanup, vacuum") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fmaint_delta")
    LT.create(Seq.range(1L, 21L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    val ver = LT.deleteDeltaForeign(spark, root, "k <= 5")
    def dataFiles() = {
      val s = Files.list(Paths.get(root, "data"))
      try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally s.close()
    }
    assert(dataFiles() == 3, "pre-delete file still on disk (stranded)")
    val ck = LT.checkpointDeltaForeign(spark, root)
    assert(ck == ver)
    assert(Files.exists(Paths.get(root, "_delta_log",
      f"$ver%020d.checkpoint.parquet")))
    val cleaned = LT.cleanupDeltaLogForeign(root)
    assert(cleaned >= 1, s"cleanup deleted $cleaned files")
    assert(!Files.exists(Paths.get(root, "_delta_log",
      f"${0L}%020d.json")), "the JSON tail below the pointer is gone")
    // an unseeded full-JSON replay refuses loudly (partial state)
    intercept[Exception] {
      LT.readDeltaExport(spark, root, useCheckpoint = false).count()
    }
    // the checkpoint-seeded read serves the post-delete rows
    val back = LT.readDeltaExport(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(back.keySet == (6L to 20L).toSet, back.keySet.toString)
    // retention respected: a wide window reclaims nothing
    assert(LT.vacuumDeltaForeign(spark, root, retainHours = 1000.0, explicitRetain = true).isEmpty)
    assert(dataFiles() == 3)
    // retention 0 reclaims exactly the stranded pre-delete file
    val gone = LT.vacuumDeltaForeign(spark, root, retainHours = 0.0, explicitRetain = true)
    assert(gone.size == 1 && gone.head.startsWith("data/"),
      gone.toString)
    assert(dataFiles() == 2)
    assert(LT.readDeltaExport(spark, root).count() == 15,
      "live rows survive the vacuum")
    // the maintained log still takes foreign commits (the pin counts
    // the checkpoint version)
    LT.appendDeltaForeign(spark, root, Seq((21L, 210L)).toDF("k", "v"))
    assert(LT.readDeltaExport(spark, root).count() == 16)
  }

  test("checkpoint tombstones survive log cleanup into the vacuum protect-set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // remove at vN, checkpoint, CLEAN the tail: the JSON remove line is
    // gone — the checkpoint's remove row is the ONLY tombstone carrier.
    // A wide-retention vacuum must still protect the removed file.
    val root = freshRoot("fmaint_tomb")
    LT.create(Seq.range(1L, 11L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    LT.deleteDeltaForeign(spark, root, "k <= 5") // strands file 1
    LT.checkpointDeltaForeign(spark, root)
    LT.cleanupDeltaLogForeign(root)
    // backdate every file's mtime far past the horizon: only the
    // TOMBSTONE (deletionTimestamp is recent) can protect the stranded
    // file now
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 400L * 3600 * 1000)
    val s = Files.walk(Paths.get(root, "data"))
    try s.iterator().asScala.filter(Files.isRegularFile(_))
      .foreach(Files.setLastModifiedTime(_, old))
    finally s.close()
    assert(LT.vacuumDeltaForeign(spark, root, retainHours = 168.0, explicitRetain = true).isEmpty,
      "the checkpoint-carried tombstone must protect the stranded file")
    // past the tombstone's window it reclaims
    val gone = LT.vacuumDeltaForeign(spark, root, retainHours = 0.0, explicitRetain = true)
    assert(gone.size == 1, gone.toString)
    assert(LT.readDeltaExport(spark, root).count() == 5)
  }

  test("checkpoint seeds the protocol: features refuse past log cleanup") {
    import spark.implicits._
    val root = freshRoot("fmaint_prot")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    LT.appendDeltaForeign(spark, root, Seq((3L, 30L)).toDF("k", "v"))
    // doctor v0's protocol to declare a writer feature outside the
    // safe set — the class of table every foreign writer must refuse
    val lf0 = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    val doctored = Files.readString(lf0).replaceAll(
      """"protocol":\{[^}]*\}""",
      """"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["rowTracking"]}""")
    assert(doctored.contains("rowTracking"), "doctor must apply")
    Files.writeString(lf0, doctored)
    val exRaw = intercept[IllegalArgumentException] {
      LT.appendDeltaForeign(spark, root, Seq((4L, 40L)).toDF("k", "v"))
    }
    assert(exRaw.getMessage.contains("rowTracking"), exRaw.getMessage)
    // checkpoint + cleanup: the protocol action's JSON line is GONE —
    // only the checkpoint's protocol row carries the features now
    LT.checkpointDeltaForeign(spark, root)
    LT.cleanupDeltaLogForeign(root)
    assert(!Files.exists(lf0), "v0 (the protocol line) must be cleaned")
    val exSeeded = intercept[IllegalArgumentException] {
      LT.appendDeltaForeign(spark, root, Seq((4L, 40L)).toDF("k", "v"))
    }
    assert(exSeeded.getMessage.contains("rowTracking"),
      s"the SEEDED protocol must still refuse: ${exSeeded.getMessage}")
  }

  test("checkpointing a log with setTransaction actions carries the watermark") {
    // round-14 upgrade: checkpoints CARRY txn rows (the spec's rule)
    // instead of the old refusal — a foreign idempotent writer's
    // watermark must survive checkpoint + log cleanup
    import spark.implicits._
    val root = freshRoot("fmaint_txn")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    val lf0 = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    Files.writeString(lf0, Files.readString(lf0).stripSuffix("\n") +
      "\n" + """{"txn":{"appId":"app-1","version":5}}""" + "\n")
    LT.appendDeltaForeign(spark, root,
      Seq((2L, 20L)).toDF("k", "v").coalesce(1))
    LT.checkpointDeltaForeign(spark, root)
    assert(LT.cleanupDeltaLogForeign(root) > 0,
      "the doctored v0 JSON must be reclaimed below the pointer")
    assert(LT.lastTxnDeltaForeign(spark, root, "app-1").contains(5L),
      "the foreign writer's watermark must ride the checkpoint")
  }

  test("iceberg foreign compaction: deletes applied, replace snapshot, time travel") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fcompact_ice")
    LT.create(Seq.range(1L, 21L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    IcebergMeta.deleteIcebergForeign(spark, root, "k <= 3")
    val parent = currentIceSnapshot(root)
    val preFiles = IcebergMeta.readIceberg(spark, root).inputFiles
      .filter(_.contains("/data/")).toSet
    val sid = IcebergMeta.rewriteDataFilesForeign(spark, root)
    assert(sid == currentIceSnapshot(root))
    // same rows, no delete application left: the compacted snapshot
    // scans a NEW file for the rewritten half and the untouched file
    // verbatim
    val back = IcebergMeta.readIceberg(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(back == (4L to 20L).map(k => k -> k * 10).toMap, back.toString)
    val postFiles = IcebergMeta.readIceberg(spark, root).inputFiles
      .filter(_.contains("/data/")).toSet
    assert(postFiles != preFiles, "the targeted file must be rewritten")
    assert(postFiles.intersect(preFiles).size == 1,
      s"the untouched file carries verbatim: $postFiles vs $preFiles")
    // time travel to the parent still serves the MOR state
    val tt = IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(parent)).as[(Long, Long)].collect().toMap
    assert(tt.keySet == (4L to 20L).toSet, "the MOR parent still reads")
    // nothing left to compact: no-op, no commit
    val verBefore = maxIceVersion(root)
    assert(IcebergMeta.rewriteDataFilesForeign(spark, root) == sid)
    assert(maxIceVersion(root) == verBefore)
    // a delete AFTER compaction applies to the compacted files
    IcebergMeta.deleteIcebergForeign(spark, root, "k = 4")
    assert(IcebergMeta.readIceberg(spark, root)
      .select($"k").as[Long].collect().toSet == (5L to 20L).toSet)
  }

  test("iceberg foreign expiry: history trimmed, artifacts reclaimed, refs pinned") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fexpire_ice")
    LT.create(Seq.range(1L, 21L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k"), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    val snap1 = currentIceSnapshot(root)
    IcebergMeta.deleteIcebergForeign(spark, root, "k <= 3")
    IcebergMeta.rewriteDataFilesForeign(spark, root)
    def metaFiles(pat: String) = {
      val s = Files.list(Paths.get(root, "metadata"))
      try s.iterator().asScala.count(_.getFileName.toString.startsWith(pat))
      finally s.close()
    }
    assert(metaFiles("delete-") >= 1, "the MOR delete parquet exists")
    val n = IcebergMeta.expireSnapshotsForeign(root, retainLast = 1)
    assert(n > 0, s"expiry must reclaim files, deleted $n")
    // the delete parquet was referenced only by expired snapshots —
    // compaction dropped it from the current one — so expiry took it
    assert(metaFiles("delete-") == 0, "delete files reclaimed")
    // the current state still serves, with nothing to re-apply
    assert(IcebergMeta.readIceberg(spark, root)
      .select($"k").as[Long].collect().toSet == (4L to 20L).toSet)
    // time travel to the expired first snapshot refuses
    intercept[Exception] {
      IcebergMeta.readIceberg(spark, root,
        snapshotAsOf = Some(snap1)).count()
    }
    // idempotent: nothing else to expire
    assert(IcebergMeta.expireSnapshotsForeign(root, retainLast = 1) == 0)
    // a later append + expiry keeps working on the maintained chain
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((21L, 210L)).toDF("k", "v"))
    assert(IcebergMeta.expireSnapshotsForeign(root, retainLast = 1) >= 1)
    assert(IcebergMeta.readIceberg(spark, root)
      .select($"k").as[Long].collect().toSet == (4L to 21L).toSet)
  }

  test("foreign ADD COLUMNS: null-fill, appends, refusals, id discipline") {
    import spark.implicits._
    // Delta face
    val droot = freshRoot("faddcol_delta")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), droot)
    LT.exportDeltaLog(spark, droot)
    wipeManifest(droot)
    LT.addColumnsDeltaForeign(spark, droot, "w BIGINT")
    val r1 = LT.readDeltaExport(spark, droot)
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(r1 == Set((1L, 10L, None), (2L, 20L, None)), r1.toString)
    LT.appendDeltaForeign(spark, droot,
      Seq((3L, 30L, Some(300L))).toDF("k", "v", "w"))
    val r2 = LT.readDeltaExport(spark, droot)
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(r2.contains((3L, 30L, Some(300L))) && r2.size == 3, r2.toString)
    // collision (case-insensitive) and NOT NULL refuse
    intercept[IllegalArgumentException] {
      LT.addColumnsDeltaForeign(spark, droot, "V STRING")
    }
    intercept[IllegalArgumentException] {
      LT.addColumnsDeltaForeign(spark, droot, "z INT NOT NULL")
    }
    // the metaData id is PRESERVED across the evolution commit
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def metaIds(root: String): Seq[String] = {
      val s = Files.list(Paths.get(root, "_delta_log"))
      val lfs = try s.iterator().asScala.toSeq.filter(
        _.getFileName.toString.matches("\\d{20}\\.json")) finally s.close()
      lfs.sortBy(_.getFileName.toString).flatMap(lf =>
        Files.readString(lf).split('\n').toSeq
          .filter(_.contains("\"metaData\""))
          .flatMap(l => Option(om.readTree(l).get("metaData"))
            .map(_.get("id").asText())))
    }
    assert(metaIds(droot).distinct.size == 1,
      s"evolution must not change the table id: ${metaIds(droot)}")

    // Iceberg face
    val iroot = freshRoot("faddcol_ice")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), iroot)
    IcebergMeta.exportIcebergMeta(spark, iroot)
    wipeManifest(iroot)
    def lastColId(root: String): Int = {
      val dir = Paths.get(root, "metadata")
      val s = Files.list(dir)
      val maxV = try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("v\\d+\\.metadata\\.json"))
        .map(_.stripPrefix("v").stripSuffix(".metadata.json").toLong)
        .max finally s.close()
      om.readTree(Files.readString(dir.resolve(s"v$maxV.metadata.json")))
        .get("last-column-id").asInt()
    }
    val before = lastColId(iroot)
    IcebergMeta.addColumnsIcebergForeign(iroot, "w BIGINT")
    assert(lastColId(iroot) == before + 1,
      "field ids are append-only above last-column-id")
    val i1 = IcebergMeta.readIceberg(spark, iroot)
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(i1 == Set((1L, 10L, None), (2L, 20L, None)), i1.toString)
    IcebergMeta.appendIcebergForeign(spark, iroot,
      Seq((3L, 30L, Some(300L))).toDF("k", "v", "w"))
    val i2 = IcebergMeta.readIceberg(spark, iroot)
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(i2.contains((3L, 30L, Some(300L))) && i2.size == 3, i2.toString)
    intercept[IllegalArgumentException] {
      IcebergMeta.addColumnsIcebergForeign(iroot, "K STRING")
    }
    intercept[IllegalArgumentException] {
      IcebergMeta.addColumnsIcebergForeign(iroot, "z INT NOT NULL")
    }
  }

  test("foreign ALTER/maintenance SQL faces dispatch by quoted path") {
    import spark.implicits._
    val droot = freshRoot("fsql_maint_d")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), droot)
    LT.exportDeltaLog(spark, droot)
    wipeManifest(droot)
    spark.sql(s"ALTER TABLE delta_export('$droot') ADD COLUMNS (note STRING)")
    assert(LT.readDeltaExport(spark, droot).columns.contains("note"))
    spark.sql(s"CHECKPOINT delta_export('$droot')")
    val s0 = Files.list(Paths.get(droot, "_delta_log"))
    val hasCk = try s0.iterator().asScala.exists(
      _.getFileName.toString.endsWith(".checkpoint.parquet"))
    finally s0.close()
    assert(hasCk, "CHECKPOINT must write the checkpoint parquet")
    spark.sql(s"VACUUM delta_export('$droot') RETAIN 1000 HOURS")
    assert(LT.readDeltaExport(spark, droot).count() == 2)

    val iroot = freshRoot("fsql_maint_i")
    LT.create(Seq.range(1L, 11L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1), iroot)
    IcebergMeta.exportIcebergMeta(spark, iroot)
    wipeManifest(iroot)
    spark.sql(s"ALTER TABLE iceberg_export('$iroot') ADD COLUMNS (note STRING)")
    assert(IcebergMeta.readIceberg(spark, iroot).columns.contains("note"))
    spark.sql(s"DELETE FROM iceberg_export('$iroot') WHERE k <= 3")
    spark.sql(s"OPTIMIZE iceberg_export('$iroot')")
    spark.sql(s"VACUUM iceberg_export('$iroot') RETAIN 1 VERSIONS")
    assert(IcebergMeta.readIceberg(spark, iroot)
      .select($"k").as[Long].collect().toSet == (4L to 10L).toSet)
  }

  test("delta foreign optimize: bin-packing, dataChange=false, DV purge, no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("fopt_delta")
    LT.create(Seq.range(1L, 41L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartition(8), root)
    LT.enableChangeDataFeed(spark, root, Seq("k"))
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    // a MOR delete puts a DV on some file; optimize must purge it
    LT.deleteDeltaForeign(spark, root, "k = 999") // no-op, keeps state simple
    val ver = LT.optimizeDeltaForeign(spark, root)
    val logTxt = Files.readString(Paths.get(root, "_delta_log",
      f"$ver%020d.json"))
    assert(""""remove":""".r.findAllIn(logTxt).size == 8, logTxt.take(400))
    assert(logTxt.contains(""""dataChange":false"""),
      "compaction must mark pure layout churn")
    assert(!logTxt.contains(""""dataChange":true"""), logTxt.take(400))
    val back = LT.readDeltaExport(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(back == (1L to 40L).map(k => k -> k * 10).toMap)
    assert(LT.readDeltaExport(spark, root).inputFiles.length == 1,
      "8 small files pack into 1")
    // CDF: the optimize version derives NO changes (dataChange=false)
    val ch = LT.readDeltaExportChanges(spark, root, ver, ver)
    assert(ch.count() == 0, "pure churn must derive zero change rows")
    // idempotent: one big file left → no-op, no commit
    val same = LT.optimizeDeltaForeign(spark, root)
    assert(same == ver)
    assert(!Files.exists(Paths.get(root, "_delta_log",
      f"${ver + 1}%020d.json")))
    // a DV-bearing file compacts regardless of size, purging the DV
    val dvroot = freshRoot("fopt_delta_dv")
    LT.create(Seq.range(1L, 11L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1), dvroot)
    LT.deleteWhereMor(spark, dvroot, "k <= 2")
    LT.exportDeltaLog(spark, dvroot)
    wipeManifest(dvroot)
    val dvVer = LT.optimizeDeltaForeign(spark, dvroot)
    val dvLog = Files.readString(Paths.get(dvroot, "_delta_log",
      f"$dvVer%020d.json"))
    assert(dvLog.contains(""""remove":""") &&
      !""""add":\{[^\n]*deletionVector""".r.findFirstIn(dvLog).isDefined,
      "the rewrite must purge the DV from the fresh add")
    assert(LT.readDeltaExport(spark, dvroot)
      .select($"k").as[Long].collect().toSet == (3L to 10L).toSet)
  }

  test("delta foreign restore: files and metaData reset, refusals") {
    import spark.implicits._
    val root = freshRoot("frestore_delta")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    LT.appendDeltaForeign(spark, root, Seq((3L, 30L)).toDF("k", "v"))
    LT.addColumnsDeltaForeign(spark, root, "w BIGINT")
    LT.deleteDeltaForeign(spark, root, "k = 1")
    // restore to v0: the appended row gone, the deleted row back, the
    // added column gone (metaData reset)
    val ver = LT.restoreDeltaForeign(spark, root, 0L)
    val back = LT.readDeltaExport(spark, root)
    assert(back.columns.toSeq == Seq("k", "v"),
      s"restore must reset the schema: ${back.columns.toSeq}")
    assert(back.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L)))
    // history preserved: the pre-restore state still time-travels
    assert(LT.readDeltaExport(spark, root, versionAsOf = Some(ver - 1))
      .count() == 2) // post-delete state had k=2,3
    // restoring to the state we are already at: no-op, no commit
    val same = LT.restoreDeltaForeign(spark, root, ver)
    assert(same == ver)
    // a vacuumed target refuses: vacuum at 0 reclaims the files only
    // the pre-restore versions reference, then restore to one of them
    LT.vacuumDeltaForeign(spark, root, retainHours = 0.0, explicitRetain = true)
    val exGone = intercept[IllegalArgumentException] {
      LT.restoreDeltaForeign(spark, root, 2L)
    }
    assert(exGone.getMessage.contains("vacuumed"), exGone.getMessage)
    // CDF tables refuse
    val croot = freshRoot("frestore_cdf")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), croot)
    LT.enableChangeDataFeed(spark, croot, Seq("k"))
    LT.exportDeltaLog(spark, croot)
    wipeManifest(croot)
    LT.appendDeltaForeign(spark, croot, Seq((2L, 20L)).toDF("k", "v"))
    val exCdf = intercept[IllegalArgumentException] {
      LT.restoreDeltaForeign(spark, croot, 0L)
    }
    assert(exCdf.getMessage.contains("CDF"), exCdf.getMessage)
  }

  test("iceberg foreign rollback: current back, history forward-travelable") {
    import spark.implicits._
    val root = freshRoot("frollback_ice")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), root)
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    val first = IcebergMeta.snapshots(root).minBy(_.seq).id
    val appended = IcebergMeta.appendIcebergForeign(spark, root,
      Seq((3L, 30L)).toDF("k", "v"))
    IcebergMeta.rollbackIcebergForeign(root, first)
    assert(IcebergMeta.readIceberg(spark, root)
      .select($"k").as[Long].collect().toSet == Set(1L, 2L))
    // the rolled-past snapshot still time-travels
    assert(IcebergMeta.readIceberg(spark, root,
      snapshotAsOf = Some(appended)).count() == 3)
    // no-op on the current snapshot; unknown snapshot refuses
    val verBefore = maxIceVersion(root)
    IcebergMeta.rollbackIcebergForeign(root, first)
    assert(maxIceVersion(root) == verBefore)
    intercept[IllegalArgumentException] {
      IcebergMeta.rollbackIcebergForeign(root, 123456789L)
    }
    // a NEW append continues above everything ever written (sequence
    // monotonicity survives the rollback)
    IcebergMeta.appendIcebergForeign(spark, root,
      Seq((4L, 40L)).toDF("k", "v"))
    assert(IcebergMeta.readIceberg(spark, root)
      .select($"k").as[Long].collect().toSet == Set(1L, 2L, 4L))
    // SQL faces
    spark.sql(s"OPTIMIZE delta_export('${freshOptRoot()}')")
    ()
  }

  private def freshOptRoot(): String = {
    import spark.implicits._
    val r = freshRoot("fopt_sql")
    LT.create(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").repartition(2), r)
    LT.exportDeltaLog(spark, r)
    wipeManifest(r)
    r
  }

  test("foreign restore/rollback SQL faces dispatch by quoted path") {
    import spark.implicits._
    val droot = freshRoot("fsql_restore_d")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), droot)
    LT.exportDeltaLog(spark, droot)
    wipeManifest(droot)
    spark.sql(s"INSERT INTO delta_export('$droot') SELECT 2L AS k, 20L AS v")
    spark.sql(s"RESTORE TABLE delta_export('$droot') TO VERSION AS OF 0")
    assert(LT.readDeltaExport(spark, droot).count() == 1)

    val iroot = freshRoot("fsql_restore_i")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), iroot)
    IcebergMeta.exportIcebergMeta(spark, iroot)
    wipeManifest(iroot)
    val first = IcebergMeta.snapshots(iroot).minBy(_.seq).id
    spark.sql(s"INSERT INTO iceberg_export('$iroot') SELECT 2L AS k, 20L AS v")
    spark.sql(s"RESTORE TABLE iceberg_export('$iroot') TO SNAPSHOT $first")
    assert(IcebergMeta.readIceberg(spark, iroot).count() == 1)
  }

  test("review pins: optimize converges, restore guards, metaData extras survive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // optimize CONVERGES: files that cannot pack into fewer outputs
    // are a no-op, not a forever-churn
    val root = freshRoot("fopt_conv")
    LT.create(Seq.range(1L, 9L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartition(4), root)
    LT.exportDeltaLog(spark, root)
    wipeManifest(root)
    val cur0 = LT.optimizeDeltaForeign(spark, root, targetBytes = 1L)
    // every file is >= 1 byte target → nOut >= small.size → no-op
    assert(!Files.exists(Paths.get(root, "_delta_log",
      f"${cur0 + 1}%020d.json")), "sub-target packing must not churn")
    // metaData extras (name/description/createdTime) survive ADD COLUMNS
    val lf0 = Paths.get(root, "_delta_log", f"${0L}%020d.json")
    Files.writeString(lf0, Files.readString(lf0).replace(
      """"metaData":{"id":""",
      """"metaData":{"name":"orders_t","createdTime":12345,"id":"""))
    assert(Files.readString(lf0).contains("orders_t"), "doctor applies")
    val ver = LT.addColumnsDeltaForeign(spark, root, "w BIGINT")
    val evolved = Files.readString(Paths.get(root, "_delta_log",
      f"$ver%020d.json"))
    assert(evolved.contains(""""name":"orders_t"""") &&
      evolved.contains(""""createdTime":12345"""),
      s"identity fields must carry through: ${evolved.take(300)}")
    // restore refuses a table whose TARGET conf enables CDF (the reset
    // would re-enable the feed inside a commit with no change rows)
    val croot = freshRoot("frestore_cdf_tgt")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), croot)
    LT.enableChangeDataFeed(spark, croot, Seq("k"))
    LT.exportDeltaLog(spark, croot)
    wipeManifest(croot)
    // doctor the CURRENT conf off: only the target (v0) declares CDF
    val lfs = {
      val s = Files.list(Paths.get(croot, "_delta_log"))
      try s.iterator().asScala.toSeq.filter(
        _.getFileName.toString.matches("\\d{20}\\.json"))
        .sortBy(_.getFileName.toString) finally s.close()
    }
    LT.appendDeltaForeign(spark, croot, Seq((2L, 20L)).toDF("k", "v"))
    val exCdf = intercept[IllegalArgumentException] {
      LT.restoreDeltaForeign(spark, croot, 0L)
    }
    assert(exCdf.getMessage.contains("CDF"), exCdf.getMessage)
    assert(lfs.nonEmpty) // (silence the unused warning deliberately)
    // restore runs the writer-feature battery like every other writer
    val froot = freshRoot("frestore_feat")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), froot)
    LT.exportDeltaLog(spark, froot)
    wipeManifest(froot)
    LT.appendDeltaForeign(spark, froot, Seq((2L, 20L)).toDF("k", "v"))
    val f0 = Paths.get(froot, "_delta_log", f"${0L}%020d.json")
    Files.writeString(f0, Files.readString(f0).replaceAll(
      """"protocol":\{[^}]*\}""",
      """"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":[],"writerFeatures":["rowTracking"]}"""))
    val exFeat = intercept[IllegalArgumentException] {
      LT.restoreDeltaForeign(spark, froot, 0L)
    }
    assert(exFeat.getMessage.contains("rowTracking"), exFeat.getMessage)
    // iceberg ADD COLUMNS refuses nested types (element-id allocation)
    val iroot = freshRoot("faddcol_nested")
    LT.create(Seq((1L, 10L)).toDF("k", "v").coalesce(1), iroot)
    IcebergMeta.exportIcebergMeta(spark, iroot)
    wipeManifest(iroot)
    intercept[IllegalArgumentException] {
      IcebergMeta.addColumnsIcebergForeign(iroot, "tags ARRAY<STRING>")
    }
    // bare VACUUM iceberg_export refuses (irreversible without RETAIN)
    val exBare = intercept[Exception] {
      spark.sql(s"VACUUM iceberg_export('$iroot')")
    }
    assert(exBare.getMessage.contains("RETAIN"), exBare.getMessage)
  }

  test("iceberg foreign delete applies across partition-evolution eras") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val root = freshRoot("fd_ice_evolved")
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    LT.create(Seq(
        (1L, "a", ts("2023-06-01T10:00:00Z")),
        (2L, "b", ts("2023-06-01T11:00:00Z")))
      .toDF("k", "cat", "ts").repartition(col("cat")),
      root, partitionBy = Seq("cat"))
    IcebergMeta.exportIcebergMeta(spark, root)
    wipeManifest(root)
    IcebergMeta.evolvePartitionSpecForeign(root,
      Seq(("ts_day", "day", "ts")))
    IcebergMeta.appendIcebergForeign(spark, root, Seq(
        (11L, "c", ts("2024-01-10T05:00:00Z")),
        (12L, "c", ts("2024-01-11T01:00:00Z")))
      .toDF("k", "cat", "ts")
      .repartition(expr("CAST(unix_micros(ts) DIV 86400000000 AS INT)")))
    // ONE delete commit hits rows in BOTH eras: the global
    // (unpartitioned-spec) position deletes apply to every file
    // regardless of which spec it was written under
    IcebergMeta.deleteIcebergForeign(spark, root, "k IN (2, 12)")
    assert(IcebergMeta.readIceberg(spark, root)
      .select($"k").as[Long].collect().toSet == Set(1L, 11L))
  }
}
