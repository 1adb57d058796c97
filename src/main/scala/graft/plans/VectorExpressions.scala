package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the embedding hot path.
  *
  * The composable `zip_with`/`aggregate` forms in
  * [[graft.functions.VectorFunctions]] are semantically right but their
  * higher-order functions evaluate via interpreted lambda calls — at bench
  * scale (10^5..10^6 cosine evaluations) that interpretation dominates. These
  * expressions generate a tight primitive loop inside whole-stage codegen:
  * no boxing, no per-element closure dispatch.
  *
  * Numeric contract (oracle parity): identical accumulation order to the
  * fold forms — widen each float to double, accumulate dot/na/nb
  * sequentially over i=0..n-1, then dot / (sqrt(na) * sqrt(nb)) — so results
  * are bit-identical to both the fold expressions and the DuckDB twin SQL.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-random-projection LSH signature over an ARRAY<FLOAT> embedding:
  * bit h is '1' iff Σ_i s(h,i)·v[i] > 0, where the hyperplane component
  * s(h,i) ∈ {+1,−1} derives from md5("srp:h:i") — fully deterministic, no
  * stored model, reproducible on any cluster AND in the DuckDB oracle twin
  * (which expands the same signs as +/− literals). Accumulation is a
  * sequential left fold from acc = 0.0 over i = 0..dims−1, bit-identical to
  * the twin's left-associated `0.0 + e[1] - e[2] ...` chain.
  *
  * One eval per row for all `planes` bits (single pass re-reading the
  * array per plane is fine: planes × dims ≈ 2k fused multiply-free adds).
  * doGenCode = a static call into the shared eval body, so signature
  * projections stay inside whole-stage codegen like the text family.
  */
case class SrpSignature(child: Expression, planes: Int, dims: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "srp_signature"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>, got ${t.simpleString}")
    }
  override def nullSafeEval(input: Any): Any =
    VectorExpressions.evalSrpSignature(input.asInstanceOf[ArrayData], planes, dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorExpressions.evalSrpSignature($c, $planes, $dims)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {
  /** Codegen'd cosine similarity over two ARRAY<FLOAT> columns. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Deterministic ±1 hyperplane component shared by the Spark expression
    * and the DuckDB twin generator: +1 iff the first hex digit of
    * md5("srp:h:i") has its high bit set (digit in [8..f]). */
  def srpSignPositive(h: Int, i: Int): Boolean =
    Character.digit(TextExpressions.md5Hex(s"srp:$h:$i").charAt(0), 16) >= 8

  // sign tables are pure functions of (planes, dims) — cache per layout so
  // the generated-code static calls don't re-derive planes×dims md5s per
  // partition
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Boolean]]]()
  private def signTable(planes: Int, dims: Int): Array[Array[Boolean]] =
    signCache.computeIfAbsent(s"$planes:$dims",
      _ => Array.tabulate(planes, dims)(srpSignPositive))

  /** Shared eval body of [[SrpSignature]] (interpreted + generated paths). */
  def evalSrpSignature(input: ArrayData, planes: Int, dims: Int): UTF8String = {
    // Strict: a shorter embedding would silently diverge from the DuckDB
    // twin (whose emb[i] beyond the end NULL-poisons the fold) — fail
    // loudly like a schema error, don't truncate.
    if (input.numElements() < dims)
      throw new IllegalArgumentException(
        s"srp_signature expects >= $dims elements, got ${input.numElements()}")
    val positive = signTable(planes, dims)
    val bits = new Array[Char](planes)
    var h = 0
    while (h < planes) {
      val p = positive(h)
      var acc = 0.0
      var i = 0
      while (i < dims) {
        val x = input.getFloat(i).toDouble
        acc = if (p(i)) acc + x else acc - x
        i += 1
      }
      bits(h) = if (acc > 0) '1' else '0'
      h += 1
    }
    UTF8String.fromString(new String(bits))
  }

  /** SRP signature column: `planes` '0'/'1' chars over a dims-long embedding. */
  def srpSignature(v: Column, planes: Int, dims: Int): Column =
    ColumnBridge.column(SrpSignature(ColumnBridge.expression(v), planes, dims))

  /** DuckDB twin of one SRP bit: left-folded ± chain over 1-based list
    * elements, compared > 0 — bit-identical to [[SrpSignature]]. */
  def sqlSrpBit(h: Int, dims: Int, emb: String): String = {
    val terms = (0 until dims).map { i =>
      val op = if (srpSignPositive(h, i)) "+" else "-"
      s"$op CAST($emb[${i + 1}] AS DOUBLE)"
    }.mkString(" ")
    s"CASE WHEN (0.0 $terms) > 0 THEN '1' ELSE '0' END"
  }

  /** DuckDB twin of the full signature string. */
  def sqlSrpSignature(planes: Int, dims: Int, emb: String): String =
    (0 until planes).map(h => sqlSrpBit(h, dims, emb)).mkString(" || ")
}
