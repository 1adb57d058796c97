package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main: stage-by-stage timings for the shingle-pipeline
  * hot path (q34/q32/q50). Not part of the engine surface. */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      // warm once, then time 3 runs
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"$name%-28s ${ts.map(_._1).min}%8.3f s   rows=${ts.head._2}")
    }

    import graft.sources.Tables
    val docs = Tables.documents(spark, d)
    time("scan_documents") { docs.count() }
    // collect the aggregate VALUE so Catalyst cannot prune the expression
    time("tokens_only") {
      docs.select(graft.plans.TextExpressions.tokens(col("text")).as("t"))
        .agg(sum(size(col("t")))).collect()(0).getLong(0)
    }
    val sh = docs.select(col("doc_id"),
      graft.plans.TextExpressions.wordShingles(col("text"), 3).as("sh"))
    time("shingles_eval") { sh.agg(sum(size(col("sh")))).collect()(0).getLong(0) }
    time("minhash_sig") {
      sh.select(graft.plans.TextExpressions.minhashSig(col("sh"), 16).as("s"))
        .agg(sum(size(col("s")))).collect()(0).getLong(0)
    }
    // q32 internals
    val sig = sh.withColumn("sig", graft.plans.TextExpressions.minhashSig(col("sh"), 16))
    val banded = sig.select(col("doc_id"), posexplode(array((0 until 8).map(b =>
      concat(element_at(col("sig"), 2 * b + 1), element_at(col("sig"), 2 * b + 2))): _*))
      .as(Seq("band_idx", "bk")))
    time("q32_banded") { banded.count() }
    time("q32_cands") {
      banded.as("x").join(banded.as("y"), Seq("band_idx", "bk"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct().count()
    }
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("explode_inv") { inv.count() }
    time("self_join_pairs") {
      inv.as("x").join(inv.as("y"), "shingle")
        .filter(col("x.doc_id") < col("y.doc_id")).count()
    }
    time("pairs_groupby") {
      inv.as("x").join(inv.as("y"), "shingle")
        .filter(col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).count().count()
    }
    time("pairs_groupby_packed") {
      inv.as("x").join(inv.as("y"), "shingle")
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select((col("x.doc_id") * 1000000000L + col("y.doc_id")).as("pk"))
        .groupBy(col("pk")).count().count()
    }
    val invInt = inv.select(col("doc_id").cast("int").as("doc_id"), col("shingle"))
    time("pairs_grpby_packed_int") {
      invInt.as("x").join(invInt.as("y"), "shingle")
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select((col("x.doc_id").cast("long") * 2147483648L + col("y.doc_id")).as("pk"))
        .groupBy(col("pk")).count().count()
    }
    time("grouped_pairs_packed") {
      inv.groupBy(col("shingle")).agg(collect_list(col("doc_id")).as("ds"))
        .select(explode(graft.plans.TextExpressions.packedPairs(col("ds"))).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("shared"))
        .select(shiftright(col("pk"), 32).as("a"),
          col("pk").bitwiseAND(0xffffffffL).as("b"), col("shared"))
        .count()
    }
    time("q34_full") { SparkEntry.queries("q34_ngram_jaccard")(spark, d).count() }
    time("q32_full") { SparkEntry.queries("q32_minhash_lsh")(spark, d).count() }
    time("q50_full") { SparkEntry.queries("q50_training_pipeline")(spark, d).count() }
    spark.stop()
  }
}
