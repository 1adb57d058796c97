package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't enough (e.g. one key holding >a partition's worth of
  * rows at 100 TB; AQE handles sort-merge skew, but a salted pre-split also
  * covers broadcast-ineligible skewed aggregations).
  *
  * Shape: the probe (large, skewed) side gets a DETERMINISTIC salt in
  * [0, n) derived by hashing stable disambiguator columns — never rand(),
  * which breaks retry determinism and the oracle; the build side is
  * replicated n× with explode(sequence(...)). Join key becomes (key, salt),
  * so one hot key spreads over n shuffle partitions.
  */
object SkewJoin {

  /** Inner-join `big ⋈ small` on `key`, spreading each key over `n` salted
    * partitions. `disambig` are probe-side columns whose hash spreads rows
    * of the same key (must be stable, e.g. a row id). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int,
      disambig: Seq[Column]): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(disambig: _*), lit(n)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
