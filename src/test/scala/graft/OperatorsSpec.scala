package graft

import org.scalatest.funsuite.AnyFunSuite

/** Operator-level checks against sf0.001 (smoke + targeted invariants).
  * Full value-level correctness is the driver's DuckDB gate (scripts/check.py
  * locally); these tests pin the engine-side semantics that the oracle can't
  * see, e.g. determinism across runs.
  */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns the reference's k=3 retrieval") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 3)
  }

  test("every declared query has an oracle twin") {
    // Sketch queries included: they oracle their CONTRACT (exact columns
    // hash-matched; each engine bounds its own sketch error as a boolean).
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("approx_count_distinct is within 5% of exact") {
    val rows = SparkEntry.queries("q44_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("sketch_within_5pct")))
  }

  test("approx_percentile is within 2% of the exact percentile") {
    val rows = SparkEntry.queries("q59_approx_percentile")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("sketch_within_2pct")))
  }

  test("all queries execute at sf0.001 and are deterministic across runs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, sf).collect()
      val b = fn(spark, sf).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"$name not deterministic")
    }
  }

  test("top-k retrieval scores are sorted descending") {
    val scores = SparkEntry.queries("q21_rag_topk")(spark, sf)
      .collect().map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("exact dedup is idempotent") {
    val d1 = SparkEntry.queries("q31_exact_dedup")(spark, sf)
    val once = d1.count()
    val distinctPairs = d1.select("user_id", "event_type").distinct().count()
    assert(once == distinctPairs)
  }

  test("near-dup pairs are ordered (a < b) with jaccard in (0,1]") {
    val rows = SparkEntry.queries("q34_ngram_jaccard")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("minhash-LSH candidates are a subset-compatible superset check: " +
    "every verified LSH pair is also found by the exact inverted index") {
    val lsh = SparkEntry.queries("q32_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("q34_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("grouped top-k aggregator equals the window form") {
    val agg = SparkEntry.queries("q51_grouped_topk")(spark, sf).collect()
    // oracle twin semantics, computed independently with a window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    val win = graft.sources.Tables.orders(spark, sf)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("o_orderpriority"), col("rank"), col("o_orderkey"))
      .orderBy(col("o_orderpriority"), col("rank")).collect()
    assert(agg.map(_.toString).toSeq == win.map(_.toString).toSeq)
  }

  test("MLlib LSH ANN returns k neighbors, none farther than exact kth") {
    val knn = graft.operators.Similarity.annLsh(spark, sf, 0L, 5).collect()
    assert(knn.length == 5)
    assert(knn.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    val dists = knn.map(_.getAs[Double]("dist"))
    assert(dists.forall(_ >= 0.0))
  }

  test("sessionize produces contiguous session ids starting at 1") {
    val rows = SparkEntry.queries("q40_sessionize")(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("session_id")).sorted
      assert(ids.head == 1L && ids.last == ids.length)
    }
  }

  test("as-of join never assigns an order dated after the event") {
    val df = SparkEntry.queries("q41_asof_join")(spark, sf)
    import org.apache.spark.sql.functions._
    val ord = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_orderkey")).agg(max(col("o_orderdate")).as("odate"))
    val evt = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"))
    val bad = df.filter(col("last_orderkey") =!= -1L)
      .join(ord, col("last_orderkey") === col("o_orderkey"))
      .join(evt, Seq("event_id"))
      .filter(col("odate") > col("ts"))
      .count()
    assert(bad == 0L)
  }
}
