package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => T, VectorFunctions => V}

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(colExpr).head().get(0)

  test("dot product of known vectors") {
    val a = array(lit(1.0f), lit(2.0f), lit(3.0f))
    val b = array(lit(4.0f), lit(-5.0f), lit(6.0f))
    assert(one(V.dot(a, b)) == 4.0 - 10.0 + 18.0)
  }

  test("norm of 3-4-0 vector is 5") {
    assert(one(V.norm(array(lit(3.0f), lit(4.0f), lit(0.0f)))) == 5.0)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val a = array(lit(1.0f), lit(2.0f))
    assert(math.abs(one(V.cosine(a, a)).asInstanceOf[Double] - 1.0) < 1e-12)
    val x = array(lit(1.0f), lit(0.0f)); val y = array(lit(0.0f), lit(1.0f))
    assert(one(V.cosine(x, y)) == 0.0)
  }

  test("cosine is symmetric and in [-1,1] on arbitrary vectors") {
    val a = array(lit(0.3f), lit(-1.7f), lit(2.2f))
    val b = array(lit(-0.9f), lit(0.4f), lit(1.1f))
    val ab = one(V.cosine(a, b)).asInstanceOf[Double]
    val ba = one(V.cosine(b, a)).asInstanceOf[Double]
    assert(ab == ba && ab >= -1.0 && ab <= 1.0)
  }

  test("l2sq of equal vectors is 0") {
    val a = array(lit(1.5f), lit(2.5f))
    assert(one(V.l2sq(a, a)) == 0.0)
  }
}

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("text").select(T.tokens(col("text")))
      .head().getSeq[String](0)

  test("tokens splits on whitespace and drops empties") {
    assert(tok("  a  b\tc ") == Seq("a", "b", "c"))
  }

  test("shingles produce n-grams, short docs produce none") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(T.shingles(T.tokens(col("text")), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq())
  }

  test("jaccard of known sets") {
    val df = Seq(1).toDF("x").select(
      T.jaccard(array(lit("a"), lit("b"), lit("c")), array(lit("b"), lit("c"), lit("d"))))
    assert(df.head().getDouble(0) == 0.5)
  }

  test("minhash is deterministic and band concatenates two components") {
    val ts = array(lit("x"), lit("y"), lit("z"))
    val df = Seq(1).toDF("i").select(
      T.minhash(ts, 0).as("m0"), T.minhash(ts, 1).as("m1"),
      T.minhashBand(ts, 0, 2).as("band"))
    val r = df.head()
    assert(r.getString(2) == r.getString(0) + r.getString(1))
    assert(r.getString(0).matches("[0-9a-f]{32}"))
  }

  test("identical token sets share minhash signatures regardless of order") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2").select(
      T.minhash(T.tokenSet(col("t1")), 7).as("m1"),
      T.minhash(T.tokenSet(col("t2")), 7).as("m2"))
    val r = df.head()
    assert(r.getString(0) == r.getString(1))
  }

  test("simhash16 is a 16-char bitstring, equal for equal token sets") {
    val df = Seq(("foo bar baz", "baz foo bar"), ("foo bar baz", "entirely different words here")).toDF("t1", "t2")
      .select(T.simhash16(T.tokenSet(col("t1"))).as("s1"),
        T.simhash16(T.tokenSet(col("t2"))).as("s2"))
    val rows = df.collect()
    assert(rows(0).getString(0).matches("[01]{16}"))
    assert(rows(0).getString(0) == rows(0).getString(1))
    assert(rows(1).getString(0) != rows(1).getString(1))
  }

  test("fingerprint canonicalizes case and whitespace") {
    val df = Seq(("Hello  World", "hello world")).toDF("t1", "t2")
      .select(T.fingerprint(col("t1")).as("f1"), T.fingerprint(col("t2")).as("f2"))
    val r = df.head()
    assert(r.getString(0) == r.getString(1))
  }

  test("regexTokenCount counts words and symbols") {
    val df = Seq("hello, world! a_b 12").toDF("text")
      .select(T.regexTokenCount(col("text")))
    // hello , world ! a_b 12
    assert(df.head().getInt(0) == 6)
  }

  test("qualityScore in [0,1]; all-stopword text scores lower") {
    val df = Seq("the a the a", "substantial meaningful engineering vocabulary").toDF("text")
      .select(T.qualityScore(T.tokens(col("text"))).as("q"))
    val rows = df.collect().map(_.getDouble(0))
    assert(rows.forall(q => q >= 0.0 && q <= 1.0))
    assert(rows(0) < rows(1))
  }
}
