package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed co-located join plans without a shuffle exchange") {
    // force a sort-merge path: broadcast would mask the bucket benefit
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_bkt", "l_orderkey", 8)

    val joined = Bucketing.cooperativeJoin(spark, "li_bkt", "ord_bkt", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n$plan")

    val plainCount = li.join(ord, "l_orderkey").count()
    assert(joined.count() == plainCount)

    val plainPlan = li.join(ord, "l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plainPlan.contains("Exchange") || plainPlan.contains("Broadcast"),
      "sanity: the unbucketed join does move data")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
