package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.VectorExpressions

/** Targeted properties of the round-2 operators, beyond the generic
  * execute+deterministic sweep in OperatorsSpec. */
class Round2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("SRP signature is 32 deterministic bits and respects the hyperplane signs") {
    import spark.implicits._
    val df = graft.sources.Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"), col("embedding"),
        VectorExpressions.srpSignature(col("embedding"), 32, 64).as("sig"))
    val rows = df.collect()
    assert(rows.forall(_.getAs[String]("sig").length == 32))
    assert(rows.forall(_.getAs[String]("sig").forall(c => c == '0' || c == '1')))
    // spot-check bit 0 against a hand fold over the same sign function
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
      var acc = 0.0
      for (i <- v.indices)
        acc = if (VectorExpressions.srpSignPositive(0, i)) acc + v(i).toDouble
              else acc - v(i).toDouble
      val expected = if (acc > 0) '1' else '0'
      assert(r.getAs[String]("sig").charAt(0) == expected)
    }
  }

  test("q35 SRP candidates: every returned pair is a<b with sim >= threshold") {
    val rows = SparkEntry.queries("q35_embedding_neardup")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      assert(r.getAs[Double]("sim") >= 0.4)
    }
  }

  test("q68 cluster reps are the minimum member and sizes sum within corpus") {
    val clusters = SparkEntry.queries("q68_dup_clusters")(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    // every multi-member cluster has >= 2 members and reps are distinct
    val reps = clusters.map(_.getAs[Long]("cluster_rep"))
    assert(reps.distinct.length == reps.length)
    assert(clusters.forall(_.getAs[Long]("n_members") >= 2))
    assert(clusters.map(_.getAs[Long]("n_members")).sum <= nDocs)
  }

  test("q94 fixed-point PageRank conserves mass up to integer truncation") {
    val rows = SparkEntry.queries("q94_pagerank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("rank_fp")).sum
    val S = 1000000000000L
    // teleport mass + damped inflow can only LOSE rank to integer floors
    // (and to dropped dangling mass); it can never create it
    assert(total <= S)
    assert(total > S / 2, s"pagerank mass collapsed: $total")
    assert(rows.forall(_.getAs[Long]("rank_fp") > 0))
  }

  test("q64 RRF fused score is exactly 1/(60+vrank) + 1/(60+krank)") {
    val rows = SparkEntry.queries("q64_hybrid_rrf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = 1.0 / (60 + r.getAs[Long]("vrank")) + 1.0 / (60 + r.getAs[Long]("krank"))
      assert(r.getAs[Double]("rrf") == expect)
    }
  }

  test("q37 centroid table is persisted with k*dims long-form rows and reused") {
    // first call builds (or reuses) the table; second must NOT add versions
    SparkEntry.queries("q37_ivf_ann")(spark, sf).collect()
    val root = graft.operators.Similarity.ivfRoot(sf)
    val vsBefore = graft.sources.LakehouseTable.versions(root)
    SparkEntry.queries("q37_ivf_ann")(spark, sf).collect()
    assert(graft.sources.LakehouseTable.versions(root) == vsBefore)
    val cents = graft.sources.LakehouseTable.read(spark, root)
    assert(cents.count() == 8L * 64L)
    assert(cents.select(countDistinct(col("cid"))).head().getLong(0) == 8L)
  }

  test("q71 salted join equals the plain join") {
    val salted = SparkEntry.queries("q71_salted_skew_join")(spark, sf)
    val li = graft.sources.Tables.lineitem(spark, sf)
    val pt = graft.sources.Tables.part(spark, sf)
    val plain = li.join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Exact.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("p_brand"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q76 gap-fill timeline is dense per user and n sums to event count") {
    val rows = SparkEntry.queries("q76_gap_fill")(spark, sf)
    val perUser = rows.groupBy(col("user_id"))
      .agg(count(lit(1)).as("hours"), min(col("hour")).as("h0"), max(col("hour")).as("h1"),
        sum(col("n")).as("events"))
      .collect()
    perUser.foreach { r =>
      val span = (r.getAs[java.sql.Timestamp]("h1").getTime -
        r.getAs[java.sql.Timestamp]("h0").getTime) / 3600000L + 1
      assert(r.getAs[Long]("hours") == span, s"user ${r.get(0)} timeline has holes")
    }
    val total = perUser.map(_.getAs[Long]("events")).sum
    val expected = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") < 50).count()
    assert(total == expected)
  }

  test("adjacent_pairs keeps multiplicity and order, shingles dedup") {
    import spark.implicits._
    val df = Seq("a b a b", "x", "", "  p  q  ").toDF("text")
      .select(graft.plans.TextExpressions.adjacentPairs(col("text")).as("p"),
        graft.plans.TextExpressions.wordShingles(col("text"), 2).as("sh"))
    val rows = df.collect().map(r =>
      (r.getAs[scala.collection.Seq[String]]("p").toList,
        r.getAs[scala.collection.Seq[String]]("sh").toList))
    assert(rows(0) == (List("a b", "b a", "a b"), List("a b", "b a")))
    assert(rows(1) == (List(), List()))
    assert(rows(2) == (List(), List()))
    assert(rows(3) == (List("p q"), List("p q")))
  }

  test("q96 distributed sweep line equals a brute-force single-pass sweep") {
    val out = SparkEntry.queries("q96_peak_concurrency")(spark, sf).collect()
    assert(out.length == 1)
    val peak = out(0).getAs[Long]("peak")
    // brute force: collect session intervals, sweep in scala
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val sess = SparkEntry.queries("q40_sessionize")(spark, sf)
      .select(col("session_start"), col("session_end")).collect()
      .map(r => (micros(r.getTimestamp(0)), micros(r.getTimestamp(1))))
    // ends are inclusive: -1 lands strictly after the end instant
    val events = sess.flatMap { case (a, b) => Seq((a, 1), (b + 1, -1)) }
      .sortBy(e => (e._1, e._2))
    var cur = 0; var best = 0
    events.foreach { e => cur += e._2; best = math.max(best, cur) }
    assert(peak == best.toLong, s"distributed=$peak brute=$best")
  }
}
