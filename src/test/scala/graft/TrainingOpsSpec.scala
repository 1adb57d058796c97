package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the training-data-pipeline additions (q88-q92), beyond the
  * oracle hash-match: decontamination only flags docs that truly share an
  * eval n-gram, packing conserves tokens and respects sequence boundaries,
  * quantization error is bounded by scale/2, hard negatives never share the
  * query's label. */
class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q88 flags only docs sharing a 3-gram with the eval set, and all of them") {
    import org.apache.spark.sql.functions._
    val flagged = SparkEntry.queries("q88_decontaminate")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    // recompute contamination directly from the fixture
    val bench = spark.read.json(graft.operators.Ingest.BenchmarkFixture)
      .select(explode(graft.plans.TextExpressions.wordShingles(col("prompt"), 3)).as("g"))
      .collect().map(_.getString(0)).toSet
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.plans.TextExpressions.wordShingles(col("text"), 3).as("sh"))
      .collect()
    docs.foreach { r =>
      val hits = r.getAs[scala.collection.Seq[String]]("sh").count(bench.contains)
      assert(flagged.getOrElse(r.getAs[Long]("doc_id"), 0L) == hits.toLong)
    }
    assert(flagged.nonEmpty)
  }

  test("q90 packing conserves shard tokens and starts each doc in one sequence") {
    val rows = SparkEntry.queries("q90_pack_sequences")(spark, sf).collect()
    assert(rows.nonEmpty)
    // sequences within a shard are contiguous from 0 and each holds >= 1 doc
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("seq_id")).sorted
      assert(ids.head == 0L && ids.zipWithIndex.forall { case (id, i) => id == i })
      assert(rs.forall(_.getAs[Long]("n_docs") >= 1))
    }
    // token conservation: packed totals == corpus totals (no doc dropped)
    import org.apache.spark.sql.functions._
    val total = graft.sources.Tables.documents(spark, sf)
      .select(size(graft.plans.TextExpressions.tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("seq_tokens")).sum == total)
  }

  test("q91 quantization error is bounded by scale/2 and output is per-vector") {
    val rows = SparkEntry.queries("q91_int8_quant")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      assert(scale > 0)
      // round() puts every element within half a quantization step
      assert(r.getAs[Double]("max_err") <= scale / 2 + 1e-12)
      assert(r.getAs[Long]("nnz") <= 64L)
    }
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
  }

  test("q92 hard negatives never share the query's label and rank within 3") {
    import org.apache.spark.sql.functions._
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 5).select(col("vec_id"), col("label"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = SparkEntry.queries("q92_hard_negatives")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("label") != labels(r.getAs[Long]("qid")))
      assert(r.getAs[Long]("rank") >= 1 && r.getAs[Long]("rank") <= 3)
    }
  }

  test("q89 repetition fractions are consistent with the flag") {
    val rows = SparkEntry.queries("q89_repetition_quality")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ttf = r.getAs[Double]("top_token_frac")
      val tbf = r.getAs[Double]("top_bigram_frac")
      val ttr = r.getAs[Double]("ttr")
      assert(ttf > 0 && ttf <= 1 && tbf > 0 && tbf <= 1 && ttr > 0 && ttr <= 1)
      val expected = if (ttf > 0.12 || tbf > 0.05) 1L else 0L
      assert(r.getAs[Long]("repetitive") == expected)
    }
  }

  test("capstone: filter → decontaminate → rebalance → expectations-gated training table") {
    import org.apache.spark.sql.functions._
    import graft.sources.{LakehouseTable => LT, Tables}
    import graft.plans.TextExpressions
    val docs = Tables.documents(spark, sf)
    val flagged = SparkEntry.queries("q88_decontaminate")(spark, sf).select("doc_id")
    // 1. quality filter (compiled expression) + benchmark decontamination
    val kept = docs
      .withColumn("score", TextExpressions.qualityScore(col("text")))
      .filter(col("score") > 0.5)
      .join(flagged, Seq("doc_id"), "left_anti")
    // 2. deterministic source rebalance to the smallest surviving source
    val counts = kept.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min(col("n_docs"))).collect()(0).getLong(0)
    val th = counts.withColumn("threshold", expr(s"($minN * 65536) div n_docs"))
    val sampled = kept
      .withColumn("bucket",
        graft.functions.TextFunctions.md5Prefix(col("doc_id").cast("string"), 4))
      .join(broadcast(th.select(col("source"), col("threshold"))), "source")
      .filter(col("bucket") < col("threshold"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    // 3. land in a versioned table behind write expectations
    val root = java.nio.file.Files.createTempDirectory("graft-capstone")
      .resolve("train").toString
    LT.create(sampled.limit(0), root)
    val (v, nRejected) = LT.appendWithExpectations(sampled, root, Map(
      "has_text" -> (length(col("text")) > 0),
      "chars_consistent" -> (col("n_chars") === length(col("text")))))
    assert(v == 1L && nRejected == 0L)
    val table = LT.read(spark, root)
    assert(table.count() == sampled.count() && table.count() > 0)
    // no contaminated doc survived; sources are balanced — the md5-bucket
    // threshold keeps ≈minN per source in EXPECTATION (mean n·th/2^16 =
    // minN), so bound the deviation generously rather than exactly
    assert(table.join(flagged, Seq("doc_id"), "left_semi").count() == 0)
    val perSource = table.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n"))
    assert(perSource.max <= 2 * minN && perSource.min >= minN / 4,
      s"rebalance out of range: ${perSource.toSeq} vs target $minN")
  }

  test("q123 chunks tile every document: stride-4 starts, window-8 slices, no token lost") {
    import org.apache.spark.sql.functions._
    val chunks = SparkEntry.queries("q123_chunk_overlap")(spark, sf).collect()
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.plans.TextExpressions.tokens(col("text")).as("toks"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("toks")).toMap
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == toks.filter(_._2.nonEmpty).keySet)
    byDoc.foreach { case (id, cs) =>
      val t = toks(id)
      // chunk_id dense from 0, start = 4*chunk_id, covers all starts < n
      val sorted = cs.sortBy(_.getAs[Long]("chunk_id"))
      assert(sorted.map(_.getAs[Long]("chunk_id")).toSeq ==
        (0L until ((t.size + 3) / 4).toLong))
      sorted.foreach { c =>
        val st = c.getAs[Long]("chunk_start").toInt
        assert(st == 4 * c.getAs[Long]("chunk_id").toInt)
        val want = t.slice(st, st + 8)
        assert(c.getAs[String]("chunk") == want.mkString(" "))
        assert(c.getAs[Long]("n_tokens") == want.size)
      }
      // every token position is covered by at least one chunk
      val covered = sorted.flatMap { c =>
        val st = c.getAs[Long]("chunk_start").toInt
        st until math.min(st + 8, t.size)
      }.toSet
      assert(covered == t.indices.toSet, s"doc $id: uncovered positions")
    }
  }

  test("q124 BM25 favors the rare term and scores only term-matching docs") {
    import org.apache.spark.sql.functions._
    val top = SparkEntry.queries("q124_bm25")(spark, sf).collect()
    assert(top.length == 20)
    val scores = top.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
    // descending, positive, tie-broken by doc_id
    scores.sliding(2).foreach { case Array((i1, s1), (i2, s2)) =>
      assert(s1 > s2 || (s1 == s2 && i1 < i2))
    }
    assert(scores.forall(_._2 > 0.0))
    // 'dup' is ~5% df vs ~80% for scan/table: every doc containing 'dup'
    // must outrank every doc with only common terms (idf separation)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.plans.TextExpressions.tokens(col("text")).as("toks"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("toks").toSet).toMap
    val topIds = scores.map(_._1)
    val dupDocs = docs.filter(_._2.contains("dup")).keySet
    val nDupInTop = topIds.count(dupDocs)
    assert(nDupInTop == math.min(20, dupDocs.size),
      s"rare-term docs missing from top-k: $nDupInTop of ${dupDocs.size}")
  }

  test("q125 split is deterministic, complete, and near the 90/5/5 target") {
    val rows = SparkEntry.queries("q125_hash_split")(spark, sf).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.values.sum == total, "splits must partition the corpus")
    assert(rows.keySet == Set("train", "val", "test"))
    // md5 buckets are uniform; 500 docs → generous binomial bounds
    assert(rows("train") > total * 8 / 10 && rows("train") < total * 95 / 100)
    assert(rows("val") > 0 && rows("test") > 0)
    // rerun is bit-identical (pure function of doc_id)
    val again = SparkEntry.queries("q125_hash_split")(spark, sf).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(again == rows)
  }

  test("q133 familiarity bands partition each lang's corpus exactly") {
    val rows = SparkEntry.queries("q133_familiarity_filter")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_alien")
        + r.getAs[Long]("n_boiler") == r.getAs[Long]("n_docs"))
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.sources.Tables.documents(spark, sf).count())
  }

  test("q134 mixture plan: rates clamp at 1, planned <= avail, sqrt upsamples small sources") {
    val rows = SparkEntry.queries("q134_mixture_plan")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("avail"),
        r.getAs[Double]("rate"), r.getAs[Long]("planned"),
        r.getAs[Boolean]("saturated")))
    assert(rows.nonEmpty)
    rows.foreach { case (_, avail, rate, planned, saturated) =>
      assert(rate > 0.0 && rate <= 1.0)
      assert(planned <= avail)
      assert(saturated == (rate == 1.0))
    }
    // planned spend stays within the ¼-corpus budget
    val totalAvail = rows.map(_._2).sum
    assert(rows.map(_._4).sum <= totalAvail / 4)
    // temperature mixing: rate ∝ floor(√avail)/avail ~ avail^-1/2, but the
    // floor steps can locally invert near-equal sources — so assert the
    // upsampling direction across REAL size gaps (≥2×, where the step
    // noise can't flip the ordering for avail ≥ 12)
    val unsat = rows.filterNot(_._5)
    for ((_, a1, r1, _, _) <- unsat; (_, a2, r2, _, _) <- unsat if a2 >= 2 * a1)
      assert(r1 >= r2, s"avail $a1 rate $r1 vs avail $a2 rate $r2")
  }

  test("q135 span profile: totals recompute from a direct window-df pass") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q135_span_dup")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_windows") <= r.getAs[Long]("total_windows"))
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
    }
    // global identity: Σ docs n_dup == Σ over shared windows of df
    val win = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(graft.plans.TextExpressions.wordShingles(col("text"), 8)).as("w"))
    val dfSum = win.groupBy(col("w")).agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2).agg(sum(col("df"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("dup_windows")).sum == dfSum)
    assert(dfSum > 0, "fixture should contain shared spans")
  }

  test("q136 leakage is bounded and val-split grams never count") {
    val rows = SparkEntry.queries("q136_split_leakage")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("leaked_windows") <= r.getAs[Long]("test_windows"))
      assert(r.getAs[Long]("n_contam") <= r.getAs[Long]("n_test_docs"))
      // a doc with any leaked window is contaminated, so the flags and
      // the window sums must be zero/nonzero together
      assert((r.getAs[Long]("n_contam") == 0) ==
        (r.getAs[Long]("leaked_windows") == 0))
    }
  }

  test("q137 probe counts partition the sampled probe set") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q137_knn_label_probe")(spark, sf).collect()
    rows.foreach(r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_probes")))
    val probes = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 25 === 0).count()
    assert(rows.map(_.getAs[Long]("n_probes")).sum == probes)
  }

  test("q138 applies exactly the q134 plan and achieves it within binomial noise") {
    val plan = SparkEntry.queries("q134_mixture_plan")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("rate"), r.getAs[Long]("planned"))).toMap
    val rows = SparkEntry.queries("q138_apply_mixture")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("source")).toSet == plan.keySet,
      "every planned source must appear in the application audit")
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (rate, planned) = plan(src)
      assert(r.getAs[Long]("planned_tokens") == planned,
        s"$src: audit must carry the plan's number, not recompute it")
      // kept count ~ Binomial(n_docs, rate): allow 4 sigma + 1
      val n = r.getAs[Long]("n_docs").toDouble
      val sigma = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(r.getAs[Long]("n_kept") - n * rate) <= 4 * sigma + 1,
        s"$src: kept ${r.getAs[Long]("n_kept")} vs expected ${n * rate}")
    }
  }

  test("q139 audit is consistent with q90's packing") {
    import org.apache.spark.sql.functions._
    val budget = graft.operators.Pipelines.PackBudget
    val rows = SparkEntry.queries("q139_packing_audit")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_split") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tail_waste") >= 0 && r.getAs[Long]("tail_waste") < budget)
      assert(r.getAs[Long]("n_seqs") * budget >= r.getAs[Long]("total_tokens"))
    }
    // shard-level totals equal q90's per-sequence sums on the same shards
    val packed = SparkEntry.queries("q90_pack_sequences")(spark, sf).collect()
      .groupBy(_.getAs[Long]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("seq_tokens")).sum).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("total_tokens") == packed(r.getAs[Long]("shard")))
    }
    // pin n_split itself: independent per-doc re-derivation from raw data
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.plans.TextExpressions.tokens(col("text"))).cast("long").as("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def shardOf(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 2), 16) % 8
    }
    val wantSplit = docs.keys.toSeq
      .map { id =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (shardOf(id), h, id)
      }
      .groupBy(_._1).view.mapValues { xs =>
        var cum = 0L; var split = 0L
        xs.sortBy(x => (x._2, x._3)).foreach { case (_, _, id) =>
          val n = docs(id); cum += n
          if (n > 0 && (cum - n) / budget != (cum - 1) / budget) split += 1
        }
        split
      }.toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_split") == wantSplit(r.getAs[Long]("shard")),
        s"shard ${r.getAs[Long]("shard")} straddle count mismatch")
    }
  }

  test("q127 re-rank scores are exact fp32 cosines in descending order, recall >= 4/5") {
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => V}
    val rows = SparkEntry.queries("q127_quantized_rerank")(spark, sf).collect()
    assert(rows.length == 5)
    val scores = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("escore"))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
    // the int8 approx pass may cost at most one of the exact top-5
    assert(rows.map(_.getAs[Long]("in_exact_top5")).sum >= 4)
    // escore is the TRUE cosine, not the quantized one: recompute directly
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val qv = emb.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    val truth = emb.crossJoin(qv)
      .select(col("vec_id"), V.cosine(col("embedding"), col("qv")).as("c"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("c")).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("escore") == truth(r.getAs[Long]("vec_id")))
    }
  }
}
