package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin
import graft.sources.Tables

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join equals plain join on lineitem ⋈ orders") {
    val li = Tables.lineitem(spark, sf)
    val ord = Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(ord, Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    val salted = SkewJoin.saltedJoin(li, ord, "l_orderkey", 8,
      disambig = Seq(col("l_orderkey"), col("l_linenumber")))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads a hot key over multiple partitions' worth of salts") {
    import spark.implicits._
    val hot = Seq.tabulate(1000)(i => (1L, i)).toDF("k", "row")
    val dim = Seq((1L, "x")).toDF("k", "v")
    val joined = SkewJoin.saltedJoin(hot, dim, "k", 8, Seq(col("row")))
    assert(joined.count() == 1000)
    val salts = hot.withColumn("__salt", pmod(hash(col("row")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts == 8)
  }
}
