package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-dedup hot path.
  *
  * The built-in composition (split → filter → transform/slice/array_join →
  * array_distinct → per-seed md5 transforms) is semantically identical but
  * every higher-order function evaluates interpreted lambdas — ~2 ms per
  * document, multiplied by self-joins re-evaluating both sides. Each
  * expression here is one compiled pass per row, and each implements
  * doGenCode (a static call into the shared eval body), so it stays INSIDE
  * whole-stage codegen: a CodegenFallback expression anywhere in a
  * projection forces the row through the interpreted path and splits the
  * fused stage — per-row overhead that multiplies across every other
  * column in the stage, not just this one.
  *
  * Hash parity contract: md5 of the UTF-8 bytes, lowercase hex — identical
  * to Spark's `md5()` and DuckDB's `md5()`, so the DuckDB oracle twins keep
  * hash-matching. Shingle order is first-occurrence (as `array_distinct`).
  */
object TextExpressions {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  /** md5 lowercase hex of the UTF-8 bytes — same as Spark/DuckDB md5(). */
  def md5Hex(s: String): String = {
    val dig = md5Local.get()
    dig.reset()
    val bytes = dig.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private[plans] def tokenize(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  // --- Static eval bodies -------------------------------------------------
  // Shared by the interpreted path (nullSafeEval) and the generated code
  // (doGenCode emits a call to the object's static forwarder), so both
  // paths are one implementation. Signatures are Java-clean on purpose:
  // UTF8String / ArrayData / int in, ArrayData / UTF8String / double out.

  def evalTokens(input: UTF8String): ArrayData =
    new GenericArrayData(tokenize(input.toString)
      .map(UTF8String.fromString(_): Any))

  private val QualityStopwords = Set("a", "the", "of", "and", "to", "in")

  def evalQualityScore(input: UTF8String): Double = {
    val toks = tokenize(input.toString)
    val n = toks.length.toDouble
    var stop = 0; var chars = 0
    var i = 0
    while (i < toks.length) {
      if (QualityStopwords.contains(toks(i))) stop += 1
      chars += toks(i).length
      i += 1
    }
    val avgLen = chars.toDouble / n
    0.5 * (1.0 - stop.toDouble / n) + 0.5 * math.min(avgLen / 8.0, 1.0)
  }

  def evalWordShingles(input: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(input.toString)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  def evalMinHashSig(input: ArrayData, k: Int): ArrayData = {
    val m = input.numElements()
    val mins = new Array[Any](k)
    if (m > 0) {
      // hash each shingle once per seed, tracking the min as we go; the
      // shingle strings are materialized once, not once per seed
      val shingles = new Array[String](m)
      var i = 0
      while (i < m) { shingles(i) = input.getUTF8String(i).toString; i += 1 }
      var s = 0
      while (s < k) {
        val prefix = s"$s:"
        var best: String = null
        i = 0
        while (i < m) {
          val h = md5Hex(prefix + shingles(i))
          if (best == null || h.compareTo(best) < 0) best = h
          i += 1
        }
        mins(s) = UTF8String.fromString(best)
        s += 1
      }
    }
    new GenericArrayData(mins)
  }

  def evalMinHashSigMix(input: ArrayData, k: Int): ArrayData = {
    val m = input.numElements()
    val mins = new Array[Any](k)
    if (m > 0) {
      val minVals = new Array[Long](k)
      java.util.Arrays.fill(minVals, Long.MaxValue)
      val dig = md5Local.get()
      var i = 0
      while (i < m) {
        dig.reset()
        val bytes = dig.digest(input.getUTF8String(i).getBytes)
        // h1/h2 = the first two big-endian 32-bit words of the digest —
        // exactly what parsing hex chars 1-8 / 9-16 yields
        val h1 = ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
          ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
        val h2 = ((bytes(4) & 0xffL) << 24) | ((bytes(5) & 0xffL) << 16) |
          ((bytes(6) & 0xffL) << 8) | (bytes(7) & 0xffL)
        var s = 0
        while (s < k) {
          val v = (h1 + s * h2) % 4294967296L
          if (v < minVals(s)) minVals(s) = v
          s += 1
        }
        i += 1
      }
      var s = 0
      while (s < k) { mins(s) = minVals(s); s += 1 }
    }
    new GenericArrayData(mins)
  }

  def evalSimHash16(input: UTF8String): UTF8String = {
    val toks = tokenize(input.toString)
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    toks.foreach(seen.add)
    val sums = new Array[Int](16)
    val it = seen.iterator()
    while (it.hasNext) {
      val h = md5Hex(it.next())
      var j = 0
      while (j < 16) {
        // high bit of hex digit j <=> digit in [8..f]
        if (Character.digit(h.charAt(j), 16) >= 8) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
    }
    val bits = new Array[Char](16)
    var j = 0
    while (j < 16) { bits(j) = if (sums(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromString(new String(bits))
  }

  def evalPackedPairs(input: ArrayData): ArrayData = {
    val m = input.numElements()
    val ids = new Array[Long](m)
    var i = 0
    while (i < m) { ids(i) = input.getLong(i); i += 1 }
    java.util.Arrays.sort(ids)
    val out = new Array[Long](m * (m - 1) / 2)
    var k = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        out(k) = (ids(i) << 32) | ids(j)
        k += 1; j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** First 8 md5 hex digits of the UTF-8 bytes as a nonnegative long —
    * bit-identical to TextFunctions.md5Prefix(c, 8) (conv of the hex
    * prefix) and DuckDB's ('0x' || substr(md5(x),1,8))::BIGINT. */
  private def md5Prefix8(s: String): Long = {
    val dig = md5Local.get()
    dig.reset()
    val bytes = dig.digest(s.getBytes("UTF-8"))
    ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
      ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
  }

  /** Winnowing fingerprint SET of a doc in one pass (Schleimer et al.
    * 2003): hash every k-token gram (md5Prefix8), slide a w-hash window,
    * collect the distinct window minima. Equivalent to the composed form
    * `shingles → md5Prefix → rowsBetween-window min → distinct`, but
    * doc-local — no posexplode, no per-doc window shuffle, no per-gram
    * Catalyst md5 — which is what makes the corpus-wide fingerprint pass
    * one scan + one explode of the (already ~2/(w+1)-compressed)
    * fingerprint arrays. O(m·w) with w small; ascending output order for
    * determinism (consumers treat it as a set). */
  def evalWinnowFps(input: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = tokenize(input.toString)
    val m = toks.length - k + 1
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      hs(i) = md5Prefix8(sb.toString)
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    var p = 0
    while (p <= m - w) {
      var mn = hs(p)
      var j = 1
      while (j < w) { if (hs(p + j) < mn) mn = hs(p + j); j += 1 }
      sel.add(mn)
      p += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  /** Per-doc Shannon entropy of the unigram distribution in 1/4096-bit
    * units, ONE doc-local pass: token counts in a local map, then
    * n·H = n·w(n) − Σ_t c_t·w(c_t) with w = the SAME fixed-point integer
    * log2 the oracle unrolls (graft.functions.TextFunctions.ilog2Fp —
    * one implementation, so the arithmetic cannot fork). Returns −1 for
    * a token-less doc (the caller filters — entropy of nothing is not
    * 0). Replaces a corpus-wide (doc, token) count shuffle + two
    * broadcast joins with zero exchanges: within-doc counting never
    * needed to leave the doc. */
  def evalDocEntropy(input: UTF8String): Long = {
    val toks = tokenize(input.toString)
    if (toks.isEmpty) return -1L
    val counts = new java.util.HashMap[String, Long](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    val n = toks.length.toLong
    var sumcw = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      sumcw += c * graft.functions.TextFunctions.ilog2Fp(c, 1)
    }
    (n * graft.functions.TextFunctions.ilog2Fp(n, 1) - sumcw) / n
  }

  /** Scalar body of [[Ilog2Fp]] — delegates to THE fixed-point log2
    * implementation (TextFunctions.ilog2Fp), so the compiled column form
    * cannot fork from the scalar/oracle arithmetic. */
  def evalIlog2Fp(n: Long): Long = graft.functions.TextFunctions.ilog2Fp(n, 1)

  def evalAdjacentPairs(input: UTF8String): ArrayData = {
    val toks = tokenize(input.toString)
    if (toks.length < 2) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - 1)
      var i = 0
      while (i < toks.length - 1) {
        out(i) = UTF8String.fromString(toks(i) + " " + toks(i + 1))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Gopher-style repetition signals of one document, single pass,
    * DOC-LOCAL (no corpus-wide (doc, gram) shuffle — the q166 entropy
    * lesson applied to n-gram counting): returns
    * `[n_tokens, top2_cov, dup3_occ, n3]` where `top2_cov` is the
    * token count covered by occurrences of the single most frequent
    * 2-gram (count × 2, overlaps uncounted — a fixed convention shared
    * with the oracle) and `dup3_occ` / `n3` are the duplicate and
    * total 3-gram OCCURRENCE counts. All integers: the fractions
    * downstream thresholds need are exact rationals. */
  def evalRepetitionStats(input: UTF8String): ArrayData = {
    val toks = tokenize(input.toString)
    val n = toks.length
    var maxBi = 0L
    if (n >= 2) {
      val bi = new java.util.HashMap[String, Long](n * 2)
      var i = 0
      while (i + 1 < n) {
        val c = bi.merge(toks(i) + " " + toks(i + 1), 1L, (a, b) => a + b)
        if (c > maxBi) maxBi = c
        i += 1
      }
    }
    var dup3 = 0L
    var n3 = 0L
    if (n >= 3) {
      val g3 = new java.util.HashMap[String, Long](n * 2)
      var i = 0
      while (i + 2 < n) {
        g3.merge(toks(i) + " " + toks(i + 1) + " " + toks(i + 2),
          1L, (a, b) => a + b)
        i += 1
      }
      val it = g3.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        n3 += c
        if (c > 1L) dup3 += c
      }
    }
    new GenericArrayData(Array[Any](n.toLong, 2L * maxBi, dup3, n3))
  }

  // --- Expression nodes ---------------------------------------------------

  private val Self = "graft.plans.TextExpressions"

  private def requireType(e: Expression, t: DataType, fn: String): TypeCheckResult = {
    val ok = (e.dataType, t) match {
      case (ArrayType(a, _), ArrayType(b, _)) => a == b
      case (a, b) => a == b
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn expects ${t.simpleString}, got ${e.dataType.simpleString}")
  }

  /** Whitespace tokens of raw text — compiled twin of TextFunctions.tokens
    * (split on \s+ after trim, empties dropped). */
  case class Tokens(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "tokens"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, prettyName)
    override def nullSafeEval(input: Any): Any =
      evalTokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalTokens($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Quality score of raw text — compiled twin of TextFunctions.qualityScore
    * with IDENTICAL double-operation order:
    * 0.5 * (1 - stop/n) + 0.5 * min((chars/n)/8, 1). */
  case class QualityScore(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "quality_score"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, prettyName)
    override def nullSafeEval(input: Any): Any =
      evalQualityScore(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalQualityScore($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Distinct word n-gram shingles of raw text, single pass. */
  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, prettyName)
    override def nullSafeEval(input: Any): Any =
      evalWordShingles(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalWordShingles($c, $n)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** k MinHash components over a shingle array: component s is
    * min over shingles of md5("s:" + shingle) — identical strings to the
    * built-in form (TextFunctions.minhash). */
  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "minhash_sig"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, ArrayType(StringType), prettyName)
    override def nullSafeEval(input: Any): Any =
      evalMinHashSig(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalMinHashSig($c, $k)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** k MIXED MinHash components (Carter-Wegman over the leading md5
    * words): md5 ONCE per element, then h_s = (h1 + s*h2) mod 2^32 per
    * seed — 16× less hashing than [[MinHashSig]] for the same banding
    * behavior; identical numbers to TextFunctions.minhashMix and its
    * DuckDB twin. Empty input → k nulls (callers filter empties). */
  case class MinHashSigMix(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "minhash_sig_mix"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, ArrayType(StringType), prettyName)
    override def nullSafeEval(input: Any): Any =
      evalMinHashSigMix(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalMinHashSigMix($c, $k)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 16-bit SimHash of the distinct-token set of raw text, as a '0'/'1'
    * string; bit j set iff Σ±1 over tokens (by hex digit j of md5(token))
    * is positive — identical to the built-in TextFunctions.simhash16. */
  case class SimHash16(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "simhash16"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, prettyName)
    override def nullSafeEval(input: Any): Any =
      evalSimHash16(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalSimHash16($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** All unordered pairs (a, b), a < b, of a long array, packed as
    * (a << 32) | b — one eval per shingle group replaces the inverted-index
    * SELF-JOIN for candidate generation: groupBy(shingle) → collect ids →
    * explode(pairs) shuffles each shingle row once instead of sort-merging
    * the 260 k-row index against itself. Packing requires ids < 2^32; the
    * caller checks the max id and falls back to the join form beyond it. */
  case class PackedPairs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "packed_pairs"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, ArrayType(LongType), prettyName)
    override def nullSafeEval(input: Any): Any =
      evalPackedPairs(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalPackedPairs($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** ALL adjacent token pairs ("a b"), with multiplicity — the raw
    * merge-candidate counts of a BPE-style tokenizer-induction pass.
    * Unlike [[WordShingles]] this does NOT dedup: pair frequency is the
    * signal. One compiled pass per row (the HOF composition
    * zip_with(slice, slice) evaluates interpreted lambdas). */
  case class DocEntropy(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "doc_entropy"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, prettyName)
    override def nullSafeEval(input: Any): Any =
      evalDocEntropy(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalDocEntropy($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "repetition_stats"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, prettyName)
    override def nullSafeEval(input: Any): Any =
      evalRepetitionStats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalRepetitionStats($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fps"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, prettyName)
    override def nullSafeEval(input: Any): Any =
      evalWinnowFps(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalWinnowFps($c, $k, $w)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class AdjacentPairs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "adjacent_pairs"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, prettyName)
    override def nullSafeEval(input: Any): Any =
      evalAdjacentPairs(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalAdjacentPairs($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Fixed-point integer log2 of a positive BIGINT (den = 1), 1/4096-bit
    * units — the compiled column form of TextFunctions.ilog2Fp, so a
    * value-keyed log table can be BUILT DISTRIBUTED (select over the
    * distinct-count relation + broadcast join) instead of collecting the
    * distinct values to the driver. Null in → null out; the domain
    * require (> 0) matches the scalar form. */
  case class Ilog2Fp(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "ilog2_fp"
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, LongType, prettyName)
    override def nullSafeEval(input: Any): Any =
      evalIlog2Fp(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalIlog2Fp($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def tokens(text: Column): Column =
    ColumnBridge.column(Tokens(ColumnBridge.expression(text)))
  def ilog2Fp(n: Column): Column =
    ColumnBridge.column(Ilog2Fp(ColumnBridge.expression(n)))
  def adjacentPairs(text: Column): Column =
    ColumnBridge.column(AdjacentPairs(ColumnBridge.expression(text)))
  def winnowFps(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(text), k, w))
  def docEntropy(text: Column): Column =
    ColumnBridge.column(DocEntropy(ColumnBridge.expression(text)))
  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))
  def qualityScore(text: Column): Column =
    ColumnBridge.column(QualityScore(ColumnBridge.expression(text)))
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
  def packedPairs(ids: Column): Column =
    ColumnBridge.column(PackedPairs(ColumnBridge.expression(ids)))
  def minhashSig(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))
  def minhashSigMix(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigMix(ColumnBridge.expression(shingles), k))
  def simhash16(text: Column): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(text)))
}
