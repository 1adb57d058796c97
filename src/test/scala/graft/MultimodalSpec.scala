package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("media table has binary payloads with kind round-robin") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.payload.nonEmpty)
      assert(Set("image", "audio", "video").contains(r.kind))
      assert(r.kind == Seq("image", "audio", "video")((r.doc_id % 3).toInt))
    }
  }

  test("decode stub is deterministic and checksum matches spark md5") {
    val feats = Multimodal.decodeAll(Multimodal.mediaTable(spark, sf)).toDF()
    val ref = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("ref_md5"),
        octet_length(col("text").cast("binary")).as("ref_len"))
    val joined = feats.join(ref, "doc_id")
    assert(joined.filter(col("checksum") =!= col("ref_md5")).count() == 0)
    assert(joined.filter(col("n_bytes") =!= col("ref_len")).count() == 0)
  }

  test("decode runs once per row across partitions (no dup/loss)") {
    val media = Multimodal.mediaTable(spark, sf)
    val feats = Multimodal.decodeAll(media)
    assert(feats.count() == media.count())
    assert(feats.select("doc_id").distinct().count() == media.count())
  }
}
