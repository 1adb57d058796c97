package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (the UDAF surface): bounded per-group top-k.
  *
  * `groupBy(g).agg(TopK(k))` keeps only k (score, id) pairs per group in a
  * bounded buffer with map-side partial aggregation — at 100 TB this is the
  * difference between shuffling k rows per group and sorting the whole
  * group (`row_number` windows sort every row; this never holds more than
  * k per partition per group).
  *
  * Determinism: ordering is (score DESC, id ASC) — ties cannot reorder
  * results across retries/partitionings.
  */
object TopK {
  type Pair = (Double, Long) // (score, id)

  private def better(a: Pair, b: Pair): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Sorted (desc) insert keeping at most k; lists are tiny (≤ k). */
  private def insert(buf: List[Pair], x: Pair, k: Int): List[Pair] = {
    val (pre, post) = buf.span(better(_, x))
    val merged = pre ::: (x :: post)
    if (merged.length > k) merged.take(k) else merged
  }

  def aggregator(k: Int): Aggregator[Pair, List[Pair], Seq[Long]] =
    new Aggregator[Pair, List[Pair], Seq[Long]] {
      override def zero: List[Pair] = Nil
      override def reduce(b: List[Pair], a: Pair): List[Pair] = insert(b, a, k)
      override def merge(b1: List[Pair], b2: List[Pair]): List[Pair] =
        b2.foldLeft(b1)((acc, x) => insert(acc, x, k))
      override def finish(r: List[Pair]): Seq[Long] = r.map(_._2)
      override def bufferEncoder: Encoder[List[Pair]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Pair]]()
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
}
