package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-exact numeric aggregation helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * twin SQL (Verify.scala / CORRECTNESS gate). A parallel double `sum()` is
  * not bit-deterministic across engines, so every money aggregate goes
  * through exact DECIMAL arithmetic and is only cast to DOUBLE at the very
  * end — one rounding, identical on both sides. Inputs are 2-dp money
  * columns (FIXTURES.md), so DECIMAL(18,2) is lossless.
  *
  * At scale this costs nothing extra: Spark's decimal sum is codegen'd and
  * the partial/final split (map-side combine) still applies.
  */
object Exact {
  private val D2 = "decimal(18,2)"

  /** Exact sum of a 2-dp money column, as DOUBLE. */
  def moneySum(c: Column): Column = sum(c.cast(D2)).cast("double")

  /** Exact sum of price*(1-disc) — 4-dp products, exact in decimal. */
  def discRevenueSum(price: Column, disc: Column): Column =
    sum(price.cast(D2) * (lit(1).cast(D2) - disc.cast(D2))).cast("double")

  /** Exact sum of price*(1-disc)*(1+tax). The 2-way product is re-cast to
    * DECIMAL(18,4) (lossless: 4 dp) before the second multiply so the scale
    * stays inside 38 digits with NO precision-loss rescale — Spark and
    * DuckDB have different rescale rules, so letting either engine rescale
    * would break hash parity. */
  def chargeSum(price: Column, disc: Column, tax: Column): Column =
    sum((price.cast(D2) * (lit(1).cast(D2) - disc.cast(D2))).cast("decimal(18,4)")
      * (lit(1).cast(D2) + tax.cast(D2))).cast("double")

  /** Exact mean: decimal sum, one double division. */
  def moneyAvg(c: Column): Column =
    sum(c.cast(D2)).cast("double") / count(lit(1))

  /** Exact mean of an integral column (sum is exact in LONG). */
  def intAvg(c: Column): Column =
    sum(c.cast("long")).cast("double") / count(lit(1))

  // --- DuckDB-side twins (string snippets for oracle SQL) -----------------
  def sqlMoneySum(c: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlDiscRevenueSum(price: String, disc: String): String =
    s"CAST(sum(CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST($disc AS DECIMAL(18,2)))) AS DOUBLE)"
  def sqlChargeSum(price: String, disc: String, tax: String): String =
    s"CAST(sum(CAST(CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST($disc AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST($tax AS DECIMAL(18,2)))) AS DOUBLE)"
  def sqlMoneyAvg(c: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / count(*)"
  def sqlIntAvg(c: String): String =
    s"CAST(sum(CAST($c AS BIGINT)) AS DOUBLE) / count(*)"
}
