package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Targeted properties of the round-6 changes. */
class Round6Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.sources.{LakehouseTable => LT}

  private def freshRoot(name: String): String = {
    val r = sources.TableCache.baseDir + s"/round6_$name"
    val p = java.nio.file.Paths.get(r)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(_.toString).reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    r
  }

  test("appendWithExpectations stamps the MAIN table under the caller's txnApp (replay guard)") {
    import spark.implicits._
    val root = freshRoot("txnapp")
    LT.create(Seq((1L, 10.0)).toDF("id", "v"), root)
    // the streaming ingest path guards replays with lastTxn(root, app) >=
    // batchId — broken while the local rejects app id shadowed the param
    val (_, nBad) = LT.appendWithExpectations(
      Seq((2L, 5.0), (3L, -1.0)).toDF("id", "v"), root,
      Map("v_nonneg" -> ($"v" >= 0)), txn = Some(7L), txnApp = "ingest_app")
    assert(nBad == 1L)
    assert(LT.lastTxn(root, "ingest_app") === Some(7L),
      "main-table append must be stamped under the caller's app id")
    // and the rejects-side watermark still rides its own dedicated app
    assert(LT.lastTxn(s"$root/_rejects", "_expectations").nonEmpty)
    // a replayed batch (same txn) is a no-op on the main table
    val vBefore = LT.currentVersion(root).get
    // caller-side guard, as ingestIntoWithExpectations does:
    if (!LT.lastTxn(root, "ingest_app").exists(_ >= 7L))
      fail("watermark missing — replay would double-append")
    assert(LT.currentVersion(root).get == vBefore)
  }

  test("delta export round-trips hive-escaped partition values (percent-encoding symmetric)") {
    import spark.implicits._
    val root = freshRoot("deltaenc")
    // partition values Spark must %-escape in dir names: space, ':', '%'
    val df = Seq(
      (1L, "a b"), (2L, "x:y"), (3L, "p%q"), (4L, "plus+v")
    ).toDF("id", "k")
    LT.create(df, root, partitionBy = Seq("k"))
    LT.exportDeltaLog(spark, root)
    // the log's add paths must decode to files that exist
    val got = LT.readDeltaExport(spark, root, useCheckpoint = false)
      .select("id", "k").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a b"), (2L, "x:y"), (3L, "p%q"), (4L, "plus+v")))
    // and through a checkpoint (stored encoded, decoded exactly once)
    LT.exportDeltaCheckpoint(spark, root, LT.currentVersion(root).get)
    val viaCkpt = LT.readDeltaExport(spark, root, useCheckpoint = true)
      .select("id", "k").as[(Long, String)].collect().toSet
    assert(viaCkpt == got)
  }

  test("drop-only delta export annotates EVERY field with physicalName + stable ids") {
    import spark.implicits._
    val root = freshRoot("dropmap")
    LT.create(Seq((1L, "x", 1.5)).toDF("a", "b", "c"), root)
    LT.alterDropColumns(spark, root, Seq("b"))
    LT.exportDeltaLog(spark, root)
    // last metaData schemaString: name mode requires physicalName + id on
    // every surviving field, identity physicalName for unrenamed columns
    val logDir = java.nio.file.Paths.get(root, "_delta_log")
    import scala.jdk.CollectionConverters._
    val lastLog = java.nio.file.Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .toSeq.sortBy(_.toString).last
    val txt = java.nio.file.Files.readString(lastLog)
    val schemaJson = """"schemaString":\s*"((?:[^"\\]|\\.)*)"""".r
      .findAllMatchIn(txt).toSeq.last.group(1)
      .replace("\\\"", "\"").replace("\\\\", "\\")
    val st = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSeq == Seq("a", "c"))
    st.fields.foreach { f =>
      assert(f.metadata.contains("delta.columnMapping.physicalName"),
        s"field ${f.name} missing physicalName in name-mode schema")
      assert(f.metadata.contains("delta.columnMapping.id"),
        s"field ${f.name} missing columnMapping.id")
      assert(f.metadata.getString("delta.columnMapping.physicalName") == f.name)
    }
    // ids derive from FIRST-APPEARANCE order over the whole history, so
    // 'c' keeps id 3 even though it is now positionally second
    val ids = st.fields.map(f =>
      f.name -> f.metadata.getLong("delta.columnMapping.id")).toMap
    assert(ids("a") == 1L && ids("c") == 3L,
      s"ids must be stable across versions, got $ids")
    // the mapped read still returns the right rows
    val got = LT.readDeltaExport(spark, root, useCheckpoint = false)
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.5)))
  }

  test("rename after export keeps the renamed column's original id (stability across epochs)") {
    import spark.implicits._
    val root = freshRoot("renmap")
    LT.create(Seq((1L, 2.0)).toDF("a", "b"), root)
    LT.exportDeltaLog(spark, root) // incremental export before the rename
    LT.alterRenameColumn(spark, root, "b", "bb")
    LT.exportDeltaLog(spark, root) // and after — ids must not renumber
    val logDir = java.nio.file.Paths.get(root, "_delta_log")
    import scala.jdk.CollectionConverters._
    val lastLog = java.nio.file.Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .toSeq.sortBy(_.toString).last
    val txt = java.nio.file.Files.readString(lastLog)
    val schemaJson = """"schemaString":\s*"((?:[^"\\]|\\.)*)"""".r
      .findAllMatchIn(txt).toSeq.last.group(1)
      .replace("\\\"", "\"").replace("\\\\", "\\")
    val st = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val bb = st.fields.find(_.name == "bb").get
    assert(bb.metadata.getString("delta.columnMapping.physicalName") == "b")
    assert(bb.metadata.getLong("delta.columnMapping.id") == 2L)
    val a = st.fields.find(_.name == "a").get
    assert(a.metadata.getString("delta.columnMapping.physicalName") == "a")
    assert(a.metadata.getLong("delta.columnMapping.id") == 1L)
  }

  test("semantic dedup pair space is HARD-bounded on a deliberately skewed cell") {
    import spark.implicits._
    // one hot cell of 300 IDENTICAL unit vectors (cosine 1.0 for every
    // pair): unbounded SemDeDup flags 299; the id-rank sub-sharding at
    // cap=128 forms pairs only within blocks (128,128,44), so exactly
    // (127 + 127 + 43) = 297 are flagged — the visible signature that no
    // task ever materialized the full |cell|² pair space
    val unit = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val hot = spark.range(300).select(
      lit(0L).as("cid"), col("id").as("vec_id"),
      typedlit(unit).as("embedding"))
    val flagged = graft.operators.Similarity.semDedupFlags(hot).count()
    assert(flagged == 297L,
      s"expected the cap's 297 within-shard flags, got $flagged " +
        "(299 would mean the cap is dormant and the cell self-join is unbounded)")
    // a balanced cell below the cap is untouched by the sharding
    val cold = spark.range(50).select(
      lit(1L).as("cid"), col("id").as("vec_id"),
      typedlit(unit).as("embedding"))
    assert(graft.operators.Similarity.semDedupFlags(cold).count() == 49L)
  }

  test("q152 reads q68's converged clusters from the cache — no second CC iteration") {
    val sf = "/root/testdata/sf0.001"
    // q68 first: builds the RelationCache'd converged cluster relation
    val q68 = SparkEntry.queries("q68_dup_clusters")(spark, sf)
    q68.count()
    // q152's plan must read that cache: its only FILE leaves are the two
    // documents scans (per-lang totals + rep-lang attribution); any
    // shingle/pair/CC lineage outside an InMemoryRelation means the loop
    // would re-run per consumer (tree collect does not descend into an
    // InMemoryRelation's stored child plan, so a file relation counted
    // here is one the query would actually re-scan)
    val q152 = SparkEntry.queries("q152_effective_corpus")(spark, sf)
    val lp = q152.queryExecution.optimizedPlan
    val fileRels = lp.collect {
      case l if l.getClass.getSimpleName.startsWith("LogicalRelation") => l
    }.size
    val inMem = lp.collect {
      case m if m.getClass.getSimpleName == "InMemoryRelation" => m
    }.size
    assert(inMem >= 1, s"q152 must read the cached cluster relation:\n$lp")
    assert(fileRels <= 2,
      s"q152 scans $fileRels file relations — the CC lineage leaked out of the cache:\n$lp")
    // and both queries agree with themselves after the share
    assert(q68.count() > 0 && q152.count() > 0)
  }

  test("write-through delta mirror: a plain append advances _delta_log with no export call") {
    import spark.implicits._
    val root = freshRoot("writethrough")
    LT.create(Seq((1L, "a")).toDF("id", "v"), root)
    LT.exportDeltaLog(spark, root) // arms the mirror
    // plain append — NO export call anywhere after this line
    LT.append(Seq((2L, "b")).toDF("id", "v"), root)
    val logV1 = java.nio.file.Paths.get(root, "_delta_log",
      f"${1L}%020d.json")
    assert(java.nio.file.Files.exists(logV1),
      "commit hook must have advanced the delta log to v1")
    // a foreign reader (log-only replay) sees the appended row immediately
    val got = LT.readDeltaExport(spark, root, useCheckpoint = false)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
    // merge/overwrite ride the same hook: overwrite → v2 in the log
    LT.overwrite(Seq((9L, "z")).toDF("id", "v"), root)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root,
      "_delta_log", f"${2L}%020d.json")))
    assert(LT.readDeltaExport(spark, root, useCheckpoint = false)
      .as[(Long, String)].collect().toSet == Set((9L, "z")))
    // checkpoint cadence: versions 3..10 via appends → a v10 checkpoint
    // appears with no explicit checkpoint call
    (3 to 10).foreach(i => LT.append(Seq((i.toLong, s"r$i")).toDF("id", "v"), root))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root,
      "_delta_log", f"${10L}%020d.checkpoint.parquet")),
      "every-10-versions checkpoint cadence must fire inside the hook")
    // and an UN-exported table pays nothing: no _delta_log appears
    val plain = freshRoot("writethrough_plain")
    LT.create(Seq((1L, "a")).toDF("id", "v"), plain)
    LT.append(Seq((2L, "b")).toDF("id", "v"), plain)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(plain, "_delta_log")))
  }

  test("ALTER COLUMN TYPE widening: epoch-typed time travel, mixed-file reads, guarded narrowing") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = freshRoot("widen")
    LT.create(Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f"), root) // int32/float32 files
    LT.alterWidenColumnType(spark, root, "i", "bigint")        // v1
    LT.alterWidenColumnType(spark, root, "f", "double")        // v2
    // post-widen append: toPhysical pins the wide type even for a narrow frame
    LT.append(Seq((3, 3.5f)).toDF("i", "f"), root)             // v3
    // current read: ONE schema over both physical epochs, all values exact
    val cur = LT.read(spark, root)
    assert(cur.schema("i").dataType == LongType && cur.schema("f").dataType == DoubleType)
    assert(cur.as[(Long, Double)].collect().toSet ==
      Set((1L, 1.5), (2L, 2.5), (3L, 3.5)))
    // time travel sees each epoch's OWN type
    assert(LT.read(spark, root, Some(0L)).schema("i").dataType == IntegerType)
    assert(LT.read(spark, root, Some(1L)).schema("i").dataType == LongType)
    assert(LT.read(spark, root, Some(1L)).schema("f").dataType == FloatType)
    assert(LT.read(spark, root, Some(2L)).schema("f").dataType == DoubleType)
    // COW delete across mixed epochs reads + rewrites correctly
    LT.deleteWhere(spark, root, "i = 2", Nil)
    assert(LT.read(spark, root).as[(Long, Double)].collect().toSet ==
      Set((1L, 1.5), (3L, 3.5)))
    // narrowing and non-numeric changes are refused
    intercept[IllegalArgumentException] {
      LT.alterWidenColumnType(spark, root, "i", "int")
    }
    intercept[IllegalArgumentException] {
      LT.alterWidenColumnType(spark, root, "f", "string")
    }
    // RESTORE to the narrow epoch restores the narrow type
    LT.restore(root, 0L)
    assert(LT.read(spark, root).schema("i").dataType == IntegerType)
  }

  test("IVF cell-index delete: probes stay identical to a full rebuild over survivors") {
    val sf = "/root/testdata/sf0.001"
    // scratch copy of the shared index (never mutate the cached one)
    val shared = graft.operators.Similarity.ivfCellTableRoot(spark, sf)
    val full = LT.read(spark, shared)
      .select(col("vec_id"), col("embedding"), col("cid").cast("long").as("cid"))
    val scratch = sources.TableCache.baseDir +
      s"/round6_ivf_del_${java.util.UUID.randomUUID().toString.take(8)}"
    LT.create(full.repartition(col("cid")), scratch, partitionBy = Seq("cid"))
    val before = LT.currentVersion(scratch).get
    // delete a slice of ONE cell through the index-aware path (cell-
    // targeted predicates are the production shape: GDPR erasure by key,
    // re-embedding a shard)
    val doomed = col("cid") === 3 && col("vec_id") % 7 === 3
    graft.operators.Similarity.deleteFromCellIndex(spark, scratch,
      "cid = 3 AND vec_id % 7 = 3")
    val after = LT.read(spark, scratch)
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
    // cell-identity with a rebuild over the survivors: same rows, same
    // cells (deletion must never re-route a surviving vector)
    val want = full.filter(!doomed).select(col("vec_id"), col("cid"))
    assert(full.filter(doomed).count() > 0, "fixture must hit the doomed slice")
    assert(after.exceptAll(want).isEmpty && want.exceptAll(after).isEmpty)
    // the hive layout survives → probes still partition-prune
    assert(LT.partitionColumns(scratch) == Seq("cid"))
    val probed = LT.read(spark, scratch)
      .filter(col("cid").cast("long") === 2L)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(probed.nonEmpty && probed.forall(_.contains("cid=2")))
    // COW file pruning: the 7 untouched cells keep their original files —
    // only the doomed cell's files rewrite
    val beforeFiles = LT.read(spark, scratch, Some(before))
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    val afterFiles = LT.read(spark, scratch)
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    val kept = afterFiles.intersect(beforeFiles)
    assert(kept.nonEmpty && kept.forall(!_.contains("cid=3")),
      s"expected only cid=3 files rewritten; kept = $kept")
    // and APPEND after DELETE still routes into exact cells (lifecycle
    // closes: build → delete → append)
    val returned = full.filter(doomed)
      .select(col("vec_id"), col("embedding"))
    graft.operators.Similarity.appendToCellIndex(spark, sf, scratch, returned)
    val restored = LT.read(spark, scratch)
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
    val wantAll = full.select(col("vec_id"), col("cid"))
    assert(restored.exceptAll(wantAll).isEmpty && wantAll.exceptAll(restored).isEmpty)
  }

  test("catalog descriptors are real JSON: ']'-bearing names round-trip, garbage is skipped") {
    import spark.implicits._
    import graft.sql.{GraftCatalog, GraftSql}
    val root = freshRoot("jsoncat")
    LT.create(Seq(1L, 2L, 3L).toDF("id"), root)
    GraftSql.register(spark, "round6_jsoncat", root)
    // a constraint name no identifier rule produced (programmatic API):
    // the old regex reader fractured on ']' inside the constraints array
    GraftCatalog.setConstraints("round6_jsoncat",
      Seq("weird]name[x" -> "id < 100"))
    // a half-written descriptor from a killed process must not poison the
    // whole catalog load
    java.nio.file.Files.writeString(
      GraftCatalog.dir.resolve("broken.json"), """{"name":"broken","ro""")
    GraftCatalog.resetInMemoryForTest()
    val e = GraftCatalog.lookup("round6_jsoncat").get
    assert(e.constraints == Seq("weird]name[x" -> "id < 100"),
      s"constraint lost or mangled across the JSON round trip: ${e.constraints}")
    assert(GraftCatalog.lookup("broken").isEmpty)
    // ':' stays the one reserved name character (the stored-form separator)
    intercept[IllegalArgumentException] {
      GraftCatalog.setConstraints("round6_jsoncat", Seq("a:b" -> "id < 1"))
    }
    java.nio.file.Files.deleteIfExists(GraftCatalog.dir.resolve("broken.json"))
    GraftSql.sql(spark, "DROP TABLE IF EXISTS round6_jsoncat")
  }

  test("delta export of a WIDENED table: new metaData, wide schema, mixed-epoch log read") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = freshRoot("widenexport")
    LT.create(Seq((1, 1.5f)).toDF("i", "f"), root)       // narrow files
    LT.exportDeltaLog(spark, root)                        // arm the mirror
    LT.alterWidenColumnType(spark, root, "i", "bigint")   // v1 (hook exports)
    LT.alterWidenColumnType(spark, root, "f", "double")   // v2
    LT.append(Seq((2L, 2.5)).toDF("i", "f"), root)        // v3, wide files
    // the widen versions must have minted fresh metaData actions with the
    // WIDE schemaString (a reader keeping v0's types would misread v3)
    val logDir = java.nio.file.Paths.get(root, "_delta_log")
    val v2log = java.nio.file.Files.readString(
      logDir.resolve(f"${2L}%020d.json"))
    assert(v2log.contains("metaData"),
      "ALTER COLUMN TYPE must export a new metaData action")
    // a log-only reader sees the wide schema and BOTH physical epochs
    val got = LT.readDeltaExport(spark, root, useCheckpoint = false)
    assert(got.schema("i").dataType == LongType &&
      got.schema("f").dataType == DoubleType)
    assert(got.as[(Long, Double)].collect().toSet ==
      Set((1L, 1.5), (2L, 2.5)))
  }

  test("q135 and q141 share ONE span-dup materialization (no second window shuffle)") {
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries("q135_span_dup")(spark, sf).count() // populate the cache
    val q141 = SparkEntry.queries("q141_curation_pipeline")(spark, sf)
    val lp = q141.queryExecution.optimizedPlan
    // q141's only file leaves may be its own docs-frame build (inside its
    // q141docs cache on first run this test might see none at all); the
    // exploded 8-gram window aggregation must come from the cached
    // spanDups relation, never a fresh documents scan per consumer
    val inMem = lp.collect {
      case m if m.getClass.getSimpleName == "InMemoryRelation" => m
    }.size
    assert(inMem >= 2, // q141docs + spanDups (mixture avail relation may add more)
      s"q141 must read both cached relations (q141docs + spanDups):\n$lp")
    val explodes = lp.collect {
      case g if g.getClass.getSimpleName == "Generate" => g
    }.size
    assert(explodes == 0,
      s"q141 re-exploded the 8-gram windows instead of reading the shared relation:\n$lp")
  }

  test("write-through mirror under concurrent appends: CAS rebase + log advance stay exact") {
    import spark.implicits._
    val root = freshRoot("concmirror")
    LT.create(Seq((0L, "seed")).toDF("id", "v"), root)
    LT.exportDeltaLog(spark, root) // arm the mirror
    // 8 writers × 3 appends each, racing the version CAS (append rebases
    // on conflict) AND the per-commit log advance (exporters race on the
    // same version files — atomic move, loser deletes its tmp)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = (1 to 3).foreach { i =>
            LT.append(Seq((w * 100L + i, s"w$w-$i")).toDF("id", "v"), root)
          }
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val want = (Set(0L -> "seed") ++
      (for (w <- 1 to 8; i <- 1 to 3) yield (w * 100L + i, s"w$w-$i"))).map(identity)
    // every append landed exactly once through the manifest...
    assert(LT.read(spark, root).as[(Long, String)].collect().toSet == want)
    // ...and the DELTA LOG replays to the identical row set: no version's
    // export was lost or doubled by the racing hooks (a lagging hook is
    // allowed to be caught up by a later commit — by now all commits are
    // done, so the log must be complete)
    LT.exportDeltaLog(spark, root) // no-op unless a crashed hook lagged
    assert(LT.readDeltaExport(spark, root, useCheckpoint = false)
      .as[(Long, String)].collect().toSet == want)
  }

  test("IVF index compaction: many maintenance appends collapse, probes keep pruning") {
    val sf = "/root/testdata/sf0.001"
    val shared = graft.operators.Similarity.ivfCellTableRoot(spark, sf)
    val full = LT.read(spark, shared)
      .select(col("vec_id"), col("embedding"), col("cid").cast("long").as("cid"))
    val scratch = sources.TableCache.baseDir +
      s"/round6_ivf_compact_${java.util.UUID.randomUUID().toString.take(8)}"
    // seed with 60%, then three maintenance append batches → file churn
    LT.create(full.filter(col("vec_id") % 5 < 3).repartition(col("cid")),
      scratch, partitionBy = Seq("cid"))
    (3 to 4).foreach { m =>
      graft.operators.Similarity.appendToCellIndex(spark, sf, scratch,
        full.filter(col("vec_id") % 5 === m).select(col("vec_id"), col("embedding")))
    }
    val filesBefore = LT.fileCount(scratch, LT.currentVersion(scratch).get)
    // OPTIMIZE the index: one file per cell again, hive layout preserved
    LT.compact(spark, scratch, numFiles = 1, partitionBy = Seq("cid"))
    val filesAfter = LT.fileCount(scratch, LT.currentVersion(scratch).get)
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
    assert(LT.partitionColumns(scratch) == Seq("cid"))
    // content identical to the full assignment, probes still prune
    val after = LT.read(spark, scratch)
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
    val want = full.select(col("vec_id"), col("cid"))
    assert(after.exceptAll(want).isEmpty && want.exceptAll(after).isEmpty)
    val probed = LT.read(spark, scratch)
      .filter(col("cid").cast("long") === 1L)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(probed.nonEmpty && probed.forall(_.contains("cid=1")))
  }

  test("widened reads keep filter pushdown and column pruning (explicit schema ≠ opaque scan)") {
    import spark.implicits._
    val root = freshRoot("widenplan")
    LT.create((1 to 100).map(i => (i, i.toFloat)).toDF("i", "f"), root)
    LT.alterWidenColumnType(spark, root, "i", "bigint")
    LT.append(Seq((200L, 9.0f)).toDF("i", "f"), root)
    val df = LT.read(spark, root).filter(col("i") > 50).select(col("i"))
    val plan = df.queryExecution.executedPlan.toString
    // the explicit-schema read path must still reach the parquet scan
    // with the predicate and the 1-column projection — otherwise every
    // widened table pays full-row scans forever
    assert(plan.contains("PushedFilters: [IsNotNull(i), GreaterThan(i,50)]"),
      s"filter not pushed into the widened scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<i:bigint>"),
      s"column pruning lost on the widened scan:\n$plan")
    assert(df.count() == 51) // 51..100 plus 200
  }

  test("widened table survives a VACUUM that erases its pre-widen epoch history") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = freshRoot("widenvac")
    LT.create(Seq((1, 1.5f)).toDF("i", "f"), root)      // narrow file
    LT.alterWidenColumnType(spark, root, "i", "bigint")
    LT.alterWidenColumnType(spark, root, "f", "double")
    LT.append(Seq((2L, 9.0)).toDF("i", "f"), root)      // wide file
    // vacuum away everything but the head: the narrow file's FIRST
    // APPEARANCE now reads as a post-widen version, so one epoch group
    // holds mixed int32/int64 footers — the per-file fallback must carry
    // the read, not an inference failure
    LT.vacuum(root, retainLast = 1)
    assert(LT.versions(root).size == 1)
    val df = LT.read(spark, root)
    assert(df.schema("i").dataType == LongType &&
      df.schema("f").dataType == DoubleType)
    assert(df.as[(Long, Double)].collect().toSet == Set((1L, 1.5), (2L, 9.0)))
  }

  test("winnowing guarantees detection of a long shared run; disjoint docs never pair") {
    import spark.implicits._
    // The MOSS coverage property: every shared window of k+w-1 tokens
    // yields at least one shared fingerprint. A 30-token shared run
    // (distinct tokens, so grams are distinct and hash-collision-free
    // w.h.p.) contains 24 complete shared windows, whose selected minima
    // are at most w apart — at least 6 distinct shared fingerprints,
    // clearing the n_shared >= 3 reporting threshold deterministically.
    val shared = (0 until 30).map(i => s"s$i").mkString(" ")
    def noise(p: String, a: Int, b: Int) = (a until b).map(i => s"$p$i").mkString(" ")
    val dir = freshRoot("winnow")
    Seq(
      (1L, s"${noise("a", 0, 20)} $shared ${noise("a", 20, 40)}"),
      (2L, s"${noise("b", 0, 20)} $shared ${noise("b", 20, 40)}"),
      (3L, noise("c", 0, 60))) // no 4-gram shared with anyone
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("q170_winnow_fingerprint")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the shared-run pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= 3L)
  }

  test("q169/q171 structural invariants at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    // bigram-LM cross-entropy: non-negative (c_ctx >= c_bigram makes every
    // fixed-point -log2 term >= 0), flags bounded by doc counts
    val lm = SparkEntry.queries("q169_bigram_lm")(spark, sf).collect()
    assert(lm.nonEmpty)
    lm.foreach { r =>
      assert(r.getLong(r.fieldIndex("sum_ce_micro")) >= 0L)
      assert(r.getLong(r.fieldIndex("n_flagged")) <= r.getLong(r.fieldIndex("n_docs")))
    }
    // PQ-ADC recall: every query answers, hits bounded by k, recall in [0, 1e6]
    val pq = SparkEntry.queries("q171_pq_adc")(spark, sf).collect()
    assert(pq.map(_.getLong(pq.head.fieldIndex("n_queries"))).sum == 16L)
    pq.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_queries"))
      val h = r.getLong(r.fieldIndex("hits_at_10"))
      assert(h >= 0L && h <= n * 10)
      val rec = r.getLong(r.fieldIndex("recall_micro"))
      assert(rec >= 0L && rec <= 1000000L)
    }
    // IVFADC: probing 2 of 8 cells must scan a strict minority of the
    // corpus — the structural claim (scan reduction) behind the index
    val corpus = graft.sources.Tables.embeddings(spark, sf).count()
    val ivfpq = SparkEntry.queries("q172_ivfpq_adc")(spark, sf).collect()
    val nq = ivfpq.map(_.getLong(ivfpq.head.fieldIndex("n_queries"))).sum
    assert(nq == 16L)
    val scanned = ivfpq.map(_.getLong(ivfpq.head.fieldIndex("sum_scanned"))).sum
    assert(scanned < nq * corpus / 2,
      s"probed scan $scanned should be well below $nq x $corpus")
  }

  test("identity columns: ordered ids, replay burns nothing, GENERATED ALWAYS, restore never regresses") {
    import spark.implicits._
    val root = freshRoot("identity")
    LT.create(Seq.empty[(Long, String)].toDF("k", "v"), root)
    LT.enableIdentity(root, "id", Seq("k"))
    LT.appendWithIdentity(spark,
      Seq((30L, "a"), (10L, "b"), (20L, "c")).toDF("k", "v"), root,
      txn = Some(1L), txnApp = "ing")
    def pairs() = LT.read(spark, root).select("k", "id")
      .as[(Long, Long)].collect().toSet
    assert(pairs() == Set((10L, 1L), (20L, 2L), (30L, 3L))) // rank of k
    // replayed micro-batch (same txn): no rows, no ids burned
    LT.appendWithIdentity(spark, Seq((99L, "x")).toDF("k", "v"), root,
      txn = Some(1L), txnApp = "ing")
    assert(pairs().size == 3)
    // next batch continues the watermark
    LT.appendWithIdentity(spark, Seq((5L, "d"), (40L, "e")).toDF("k", "v"),
      root, txn = Some(2L), txnApp = "ing")
    assert(pairs() == Set((10L, 1L), (20L, 2L), (30L, 3L), (5L, 4L), (40L, 5L)))
    // GENERATED ALWAYS: caller-supplied ids are rejected
    intercept[IllegalArgumentException] {
      LT.appendWithIdentity(spark,
        Seq((1L, "z", 9L)).toDF("k", "v", "id"), root)
    }
    // RESTORE to the first-append epoch drops rows 4-5, but the watermark
    // carries FORWARD: the next allocation starts at 6, ids never reuse
    val vFirstAppend = 2L
    LT.restore(root, vFirstAppend)
    LT.appendWithIdentity(spark, Seq((50L, "f")).toDF("k", "v"), root)
    assert(pairs() == Set((10L, 1L), (20L, 2L), (30L, 3L), (50L, 6L)))
  }

  test("in-commit timestamps: TIMESTAMP AS OF survives mtime churn, stamps stay monotonic") {
    import spark.implicits._
    val root = freshRoot("incommitts")
    LT.create(Seq((1L, "a")).toDF("k", "v"), root)
    Thread.sleep(5)
    LT.append(Seq((2L, "b")).toDF("k", "v"), root)
    val ts0 = LT.commitTsAt(root, 0L).get
    val ts1 = LT.commitTsAt(root, 1L).get
    assert(ts0 < ts1, s"in-commit stamps must be strictly monotonic: $ts0, $ts1")
    // a backup-restore / rsync touches every file: mtime-based time
    // travel would now resolve everything to 'the restore moment' — the
    // in-commit stamp must keep the original answers
    import java.nio.file.{Files => F, Paths, attribute}
    LT.versions(root).foreach { v =>
      F.setLastModifiedTime(Paths.get(root, "_manifest", s"$v.json"),
        attribute.FileTime.fromMillis(System.currentTimeMillis() + 3600000))
    }
    assert(LT.versionAt(root, ts0) == Some(0L))
    assert(LT.versionAt(root, ts1 - 1) == Some(0L))
    assert(LT.versionAt(root, ts1) == Some(1L))
    assert(LT.versionAt(root, ts0 - 1).isEmpty)
  }

  test("metadata-only count(*): LocalRelation plan across versions; declines under filter/DV") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot("metacount")
    LT.create((1L to 100L).toDF("k"), root)
    LT.append((101L to 150L).toDF("k"), root)
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
    val c = LT.read(spark, root).groupBy().count()
    assert(c.head().getLong(0) == 150L)
    assert(planOf(c).contains("LocalRelation"),
      s"expected a footer-count LocalRelation, got:\n${planOf(c)}")
    // time travel: the pinned version's own file set is what gets counted
    val c0 = LT.read(spark, root, Some(0L)).groupBy().count()
    assert(c0.head().getLong(0) == 100L && planOf(c0).contains("LocalRelation"))
    // a FILTERED count is selective — the rule must decline and the scan run
    val f = LT.read(spark, root).filter(col("k") <= 10).groupBy().count()
    assert(f.head().getLong(0) == 10L)
    assert(!planOf(f).contains("LocalRelation"))
    // min/max over INT64 columns come from footer stats (same files);
    // a DOUBLE column declines (parquet NaN stats are untrustworthy) and
    // scans — correct either way
    import org.apache.spark.sql.functions.{min, max}
    val mm = LT.read(spark, root).agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
    assert(mm.head() == org.apache.spark.sql.Row(1L, 150L))
    assert(planOf(mm).contains("LocalRelation"), planOf(mm))
    val root2 = freshRoot("metacount2")
    LT.create(Seq((1L, 1.5), (2L, 9.5)).toDF("k", "x"), root2)
    val md = LT.read(spark, root2).agg(min(col("x")).as("lo"))
    assert(md.head().getDouble(0) == 1.5)
    assert(!planOf(md).contains("LocalRelation"))
    // a deletion-vector read is an anti-join plan — footer counts would
    // overcount the deleted rows; the rule never sees a bare relation
    LT.deleteWhereMor(spark, root, "k % 2 = 0")
    val dv = LT.read(spark, root).groupBy().count()
    assert(dv.head().getLong(0) == 75L)
  }

  test("eventsStream over an empty staging dir falls back to the declared schema") {
    val dir = java.nio.file.Files.createTempDirectory("round6-empty-stage").toString
    // must NOT throw (start-before-first-file deployment)
    val stream = graft.streaming.Streams.eventsStream(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.contains("ts"))
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType) // normalized, session-TZ
  }
}
