package graft

import org.apache.spark.sql.SparkSession

import graft.plans.TextExpressions.{AdjacentPairs, MinHashSig, SimHash16, Tokens, WordShingles}
import graft.plans.{CosineSimilarity, SrpSignature}

/** SQL-surface registration for the engine's custom Catalyst expressions,
  * so `spark.sql` users get them as first-class functions:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  *
  * Idempotent per session (createOrReplace). Integer arguments must be
  * foldable literals (they parametrize the expression, not the row).
  */
object GraftFunctions {
  private def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    require(e.foldable, s"expected an integer literal, got non-constant $e")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"expected an integer literal, got $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es(0), intArg(es(1))), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es(0), intArg(es(1))), "built-in")
    reg.createOrReplaceTempFunction("simhash16",
      es => SimHash16(es(0)), "built-in")
    reg.createOrReplaceTempFunction("srp_signature",
      es => SrpSignature(es(0), intArg(es(1)), intArg(es(2))), "built-in")
    reg.createOrReplaceTempFunction("graft_tokens",
      es => Tokens(es(0)), "built-in")
    reg.createOrReplaceTempFunction("adjacent_pairs",
      es => AdjacentPairs(es(0)), "built-in")
  }
}
