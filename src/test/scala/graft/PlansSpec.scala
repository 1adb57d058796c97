package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.plans.{TextExpressions => X, VectorExpressions}

/** The compiled (custom Catalyst expression) forms must be EXACTLY
  * equivalent to the built-ins-only forms they replace — the DuckDB oracle
  * twins were written against the built-in semantics. */
class PlansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val docs = graft.sources.Tables
    .documents(spark, "/root/testdata/sf0.001")

  test("codegen cosine == fold cosine, bit-exact, on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val diff = e.crossJoin(broadcast(q))
      .select(V.cosine(col("embedding"), col("qv")).as("fast"),
        V.cosineFold(col("embedding"), col("qv")).as("fold"))
      .filter(col("fast") =!= col("fold"))
      .count()
    assert(diff == 0L)
  }

  test("WordShingles == array_distinct(shingles(tokens(text))) on real docs") {
    val diff = docs.select(
      X.wordShingles(col("text"), 3).as("fast"),
      array_distinct(T.shingles(T.tokens(col("text")), 3)).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0L)
  }

  test("MinHashSig components == seeded md5 minhash built-in on real docs") {
    val base = docs.select(X.wordShingles(col("text"), 3).as("sh"))
    val diff = base.select(
      X.minhashSig(col("sh"), 4).as("sig"),
      array(T.minhash(col("sh"), 0), T.minhash(col("sh"), 1),
        T.minhash(col("sh"), 2), T.minhash(col("sh"), 3)).as("ref"))
      .filter(col("sig") =!= col("ref"))
      .count()
    assert(diff == 0L)
  }

  test("SimHash16 expression == built-in simhash16 on real docs") {
    val diff = docs.select(
      X.simhash16(col("text")).as("fast"),
      T.simhash16(T.tokenSet(col("text"))).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0L)
  }

  test("Tokens and QualityScore compiled forms == built-in forms on real docs") {
    val bigger = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val diff = bigger.select(
      X.tokens(col("text")).as("fast_t"),
      T.tokens(col("text")).as("slow_t"),
      X.qualityScore(col("text")).as("fast_q"),
      T.qualityScore(T.tokens(col("text"))).as("slow_q"))
      .filter(col("fast_t") =!= col("slow_t") || col("fast_q") =!= col("slow_q"))
      .count()
    assert(diff == 0L)
  }

  test("WinnowFps == composed shingle/md5/window-min/distinct form on real docs") {
    import org.apache.spark.sql.expressions.Window
    val (k, w) = (4, 4)
    val composed = docs
      .select(col("doc_id"), T.shingles(X.tokens(col("text")), k).as("g"))
      .filter(size(col("g")) >= w)
      .withColumn("m", size(col("g")))
      .select(col("doc_id"), col("m"), posexplode(col("g")).as(Seq("pos", "gram")))
      .withColumn("h", T.md5Prefix(col("gram"), 8))
      .withColumn("fp", min(col("h")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.currentRow, w - 1)))
      .filter(col("pos") <= col("m") - w)
      .select(col("doc_id"), col("fp")).distinct()
    val compiled = docs.select(col("doc_id"),
      explode(X.winnowFps(col("text"), k, w)).as("fp"))
    assert(compiled.count() == composed.count()) // compiled emits sets already
    assert(compiled.exceptAll(composed).count() == 0L)
    assert(composed.exceptAll(compiled).count() == 0L)
    // degenerate inputs: too-short docs yield empty fingerprint sets
    import spark.implicits._
    val short = Seq("", "a b c", "a b c d e f").toDF("text")
      .select(X.winnowFps(col("text"), k, w).as("f")).collect()
    assert(short.forall(_.getSeq[Long](0).isEmpty))
  }

  test("Ilog2Fp compiled column == TextFunctions.ilog2Fp scalar, null-safe") {
    import spark.implicits._
    // powers of two, power±1 boundaries, and the large end of the domain
    val vals = (Seq(1L, 2L, 3L, 5L, 7L, 100L, 4095L, 4096L, 4097L) ++
      (0 to 41).map(1L << _) ++ (1 to 41).map(b => (1L << b) - 1)).distinct
    val got = vals.toDF("v")
      .select(col("v"), X.ilog2Fp(col("v")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      assert(got(v) == graft.functions.TextFunctions.ilog2Fp(v, 1),
        s"ilog2Fp($v): compiled ${got(v)} != scalar")
    }
    val n = Seq[java.lang.Long](null).toDF("v")
      .select(X.ilog2Fp(col("v")).as("w")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("WordShingles on degenerate inputs") {
    import spark.implicits._
    val rows = Seq("", "  ", "one two", "a b c", "x x x x")
      .toDF("text").select(X.wordShingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq() && rows(1) == Seq() && rows(2) == Seq())
    assert(rows(3) == Seq("a b c"))
    assert(rows(4) == Seq("x x x")) // distinct collapses repeats
  }
}
