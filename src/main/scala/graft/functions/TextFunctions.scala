package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions over `documents.text`.
  *
  * Engine-local generalization of the reference's string handling (truncate/
  * newline-strip `app/app.py:113-115`, regex rewrites
  * `lakehouse_app_helpers.py:38-53`) plus the north-star text-pipeline ops
  * (tokenize, shingles, MinHash, SimHash, fingerprints, quality scores).
  *
  * Hash determinism: all content hashes go through `md5` (hex string) —
  * identical in Spark and DuckDB — never engine-private hash functions.
  * MinHash uses the lexicographic MIN of seeded md5 hex strings: a valid
  * min-wise permutation proxy that both engines compute identically.
  * Everything is built-in expressions → codegen, no UDFs in the hot path.
  */
object TextFunctions {

  /** Whitespace tokenizer; drops empty tokens (text has trailing blanks). */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > lit(0))

  /** Distinct token set (order-independent, for set similarity). */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Word n-gram shingles of a token array, joined with a single space. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))

  /** One MinHash signature component: min over tokens of md5(seed:token). */
  def minhash(tokSet: Column, seed: Int): Column =
    array_min(transform(tokSet, t => md5(concat(lit(s"$seed:"), t))))

  /** One MIXED MinHash component: md5 is computed ONCE per element and the
    * per-seed permutation comes from Carter-Wegman mixing of its two
    * leading 32-bit words — h_s(x) = (h1(x) + s*h2(x)) mod 2^32 — instead
    * of k separate md5 passes. 16× less hashing for a 16-component
    * signature with the same banding behavior; bit-identical in DuckDB
    * (hex-parse + integer arithmetic, see [[sqlMinhashMix]]). This is the
    * composable twin of the compiled TextExpressions.MinHashSigMix. */
  def minhashMix(elems: Column, s: Int): Column =
    array_min(transform(elems, x =>
      (conv(substring(md5(x), 1, 8), 16, 10).cast("long")
        + lit(s.toLong) * conv(substring(md5(x), 9, 8), 16, 10).cast("long"))
        % lit(4294967296L)))

  /** First `hexLen` md5 hex digits of `c` as a nonnegative BIGINT — THE
    * cross-engine hash-bucket construct (DuckDB twin: [[sqlMd5Prefix]]).
    * Every sampling / splitting / sketch bucket routes through this PAIR
    * so the Spark side and its oracle cannot drift independently: a
    * change here must change both, in one place. `hexLen` <= 15 keeps
    * the value inside a signed 64-bit int in both engines. */
  def md5Prefix(c: Column, hexLen: Int): Column =
    conv(substring(md5(c), 1, hexLen), 16, 10).cast("long")

  /** DuckDB twin of [[md5Prefix]] over a SQL expression string. */
  def sqlMd5Prefix(expr: String, hexLen: Int): String =
    s"('0x' || substr(md5($expr), 1, $hexLen))::BIGINT"

  /** Fixed-point log2(num/den) in PURE integer arithmetic — the engine's
    * stand-in for libm log weights, which cross-engine rounding drift
    * rules out of oracled output (q130 note). Integer part from binary
    * lengths; 12 fractional bits by shift-and-square on a 20-bit
    * mantissa. Every op is a 64-bit multiply/shift/compare, so the result
    * is bit-identical in any engine repeating the recipe — the SQL twin
    * [[sqlIlog2Ctes]] unrolls the same 12 steps. Unit: 1/4096 of a bit
    * (wt = e·4096 + 12-bit fraction). Domain bound: num,den < 2^42 keeps
    * every intermediate inside a signed long (num << 21 worst case); at
    * larger counts reduce the fraction first. Used by the DSIR weights
    * (q160) and token entropy (q166). */
  def ilog2Fp(num: Long, den: Long): Long = {
    require(num > 0 && den > 0, s"ilog2Fp domain: $num / $den")
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    def mantissa(e: Int): Long =
      if (e >= 0) (num << 20) / (den << e) else (num << (20 - e)) / den
    var e = bitlen(num) - bitlen(den)
    var m = mantissa(e)
    if (m < (1L << 20)) { e -= 1; m = mantissa(e) }
    var f = 0L
    var i = 0
    while (i < 12) {
      var m2 = (m * m) >> 20
      if (m2 >= (1L << 21)) { m2 >>= 1; f = f * 2 + 1 } else f = f * 2
      m = m2
      i += 1
    }
    e.toLong * 4096 + f
  }

  /** DuckDB twin of [[ilog2Fp]] as a reusable CTE chain: `srcRel` must
    * provide columns (`key`, num, den); the chain ends in `${p}wts AS
    * (SELECT $key, wt)`. Every consumer (q160's DSIR weights, q166's
    * entropy weights) routes through this ONE generator so the unrolled
    * arithmetic can never fork from the Scala side. */
  def sqlIlog2Ctes(p: String, srcRel: String, key: String): String = {
    val iter = (1 to 12).map { i =>
      s"""${p}d$i AS (SELECT $key, e,
             CASE WHEN m2 >= 2097152 THEN m2 >> 1 ELSE m2 END AS m,
             f * 2 + CASE WHEN m2 >= 2097152 THEN 1 ELSE 0 END AS f
           FROM (SELECT $key, e, (m * m) >> 20 AS m2, f FROM ${p}d${i - 1}))"""
    }.mkString(",\n          ")
    s"""${p}ebl AS (SELECT $key, num, den,
            CAST(length(bin(num)) - length(bin(den)) AS BIGINT) AS e0
          FROM $srcRel),
        ${p}em AS (SELECT $key, e0,
            CASE WHEN e0 >= 0 THEN (num << 20) // (den << e0)
                 ELSE (num << (20 - e0)) // den END AS ma,
            CASE WHEN e0 - 1 >= 0 THEN (num << 20) // (den << (e0 - 1))
                 ELSE (num << (20 - (e0 - 1))) // den END AS mb
          FROM ${p}ebl),
        ${p}d0 AS (SELECT $key,
            CASE WHEN ma < 1048576 THEN e0 - 1 ELSE e0 END AS e,
            CASE WHEN ma < 1048576 THEN mb ELSE ma END AS m,
            CAST(0 AS BIGINT) AS f
          FROM ${p}em),
        $iter,
        ${p}wts AS (SELECT $key, e * 4096 + f AS wt FROM ${p}d12)"""
  }

  /** LSH band key: concat of `width` adjacent MinHash components. */
  def minhashBand(tokSet: Column, band: Int, width: Int): Column =
    concat((0 until width).map(j => minhash(tokSet, band * width + j)): _*)

  /** Exact Jaccard over two token-set arrays (integer counts → one double
    * division → bit-deterministic). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** 16-bit SimHash fingerprint as a '0'/'1' string. Bit j is the sign of
    * sum over distinct tokens of ±1, where +1 iff hex digit j of md5(token)
    * has its high bit set. String form keeps the oracle twin trivial. */
  def simhash16(tokSet: Column): Column = {
    val bits = (0 until 16).map { j =>
      val contrib = transform(tokSet, t =>
        when(substring(md5(t), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
          .otherwise(-1))
      when(aggregate(contrib, lit(0), (acc, x) => acc + x) > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Canonical content fingerprint: md5 of lowercased, whitespace-collapsed
    * text (the deterministic stand-in for a rolling hash). */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** BPE-ish token count: words OR single non-space symbols. */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  private val Stopwords = Seq("a", "the", "of", "and", "to", "in")

  /** Quality score in [0,1]: penalizes stopword-heavy, short-token text.
    * All terms are exact count ratios — deterministic double arithmetic. */
  def qualityScore(toks: Column): Column = {
    val n = size(toks).cast("double")
    val stop = size(filter(toks, t => t.isin(Stopwords.map(lit): _*))).cast("double")
    val chars = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
    val avgLen = chars / n
    // weights sum to 1; avgLen/8 saturates at 1 for >=8-char avg tokens
    lit(0.5) * (lit(1.0) - stop / n) + lit(0.5) * least(avgLen / lit(8.0), lit(1.0))
  }

  // --- DuckDB twins -------------------------------------------------------
  val sqlToks = "list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0)"
  val sqlTokSet = s"list_distinct($sqlToks)"

  /** DuckDB twin of [[simhash16]] over a token-set SQL expression — the ONE
    * place the 16-bit hash convention lives for SQL (used by the q33 and
    * q63 oracles; a convention change must not fork between them). */
  def sqlSimhash16(tokSetExpr: String): String =
    (0 until 16).map { j =>
      s"""CASE WHEN list_sum(list_transform($tokSetExpr, t ->
          CASE WHEN substring(md5(t), ${j + 1}, 1) IN ('8','9','a','b','c','d','e','f')
          THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"""
    }.mkString(" || ")
  def sqlMinhash(tokSetExpr: String, seed: Int): String =
    s"list_min(list_transform($tokSetExpr, t -> md5('$seed:' || t)))"

  /** DuckDB twin of [[minhashMix]]: '0x'||hex → BIGINT parses the md5
    * words exactly as Spark's conv(_, 16, 10); all arithmetic stays in
    * BIGINT (values < 2^37), so % 2^32 matches Spark's long remainder. */
  def sqlMinhashMix(elemsExpr: String, s: Int): String =
    s"""list_min(list_transform($elemsExpr, x ->
        (('0x' || substr(md5(x), 1, 8))::BIGINT
         + $s * ('0x' || substr(md5(x), 9, 8))::BIGINT) % 4294967296))"""
  def sqlJaccard(a: String, b: String): String =
    s"(CAST(len(list_intersect($a, $b)) AS DOUBLE) / CAST(len(list_distinct(list_concat($a, $b))) AS DOUBLE))"
  val sqlFingerprint = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
  val sqlRegexTokenCount =
    "len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))"
}
