package graft.sources

import org.apache.spark.sql.types._

/** Iceberg partition-transform arithmetic for SCAN PLANNING over
  * foreign chains (spec §Partition Transforms + Appendix B): given a
  * data file's recorded transform value, derive what it implies about
  * the SOURCE column's rows — a [lo, hi] range in the shared
  * [[MetricsPruning]] norm space for the order-preserving transforms
  * (`day`/`month`/`year`/`hour` on temporals, `truncate[W]` on
  * ints/longs/strings), and an equality-only bucket check for
  * `bucket[N]` (murmur3_x86_32 per Appendix B — hash order has no
  * relation to value order, so bucket values can never bound a range).
  *
  * This is the most common real Iceberg layout (`day(ts)` partition
  * specs): without it, a predicate on the source timestamp derives
  * ZERO file pruning from the partition struct, because transform
  * fields are not schema columns and identity projection cannot see
  * them. Everything here is driver-side O(1) per (file, transform).
  *
  * All temporal transforms count units from the Unix epoch in UTC
  * (spec: "timestamps are adjusted to UTC before the transform"), so
  * the derived micros/day ranges line up with Spark's internal
  * TimestampType (UTC micros) and DateType (epoch days) — the same
  * norm space MetricsPruning's literals live in. */
private[graft] object IcebergTransforms {

  sealed trait Transform
  case object Day extends Transform
  case object Month extends Transform
  case object Year extends Transform
  case object Hour extends Transform
  final case class Bucket(n: Int) extends Transform
  final case class Truncate(w: Int) extends Transform

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Parse a spec transform string; None for identity/void/unknown
    * (no pruning information — callers keep files conservatively). */
  def parse(s: String): Option[Transform] = s match {
    case "day"   => Some(Day)
    case "month" => Some(Month)
    case "year"  => Some(Year)
    case "hour"  => Some(Hour)
    case BucketRe(n) if n.toLong > 0 && n.toLong <= Int.MaxValue =>
      Some(Bucket(n.toInt))
    case TruncateRe(w) if w.toLong > 0 && w.toLong <= Int.MaxValue =>
      Some(Truncate(w.toInt))
    case _ => None
  }

  /** murmur3_x86_32 (public domain algorithm; the hash Iceberg's
    * Appendix B mandates for bucketing), seed 0. */
  def murmur3x86_32(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks * 4
    val rem = data.length & 3
    var k1 = 0
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Appendix B hash input bytes: every integral/temporal type hashes
    * as the 8-byte little-endian LONG of its value (int upcast, date =
    * epoch days, timestamp = UTC micros), strings as UTF-8 bytes. */
  def bucketHashLong(v: Long): Int = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    murmur3x86_32(b)
  }

  def bucketHashString(s: String): Int =
    murmur3x86_32(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Bucket index of a CATALYST-internal literal value under the
    * source column's Spark type; None when the type has no Appendix-B
    * byte form here (callers keep the file). */
  def bucketOf(n: Int, raw: Any, dt: DataType): Option[Int] = {
    val h: Option[Int] = (dt, raw) match {
      case (IntegerType | ShortType | ByteType | DateType,
          x: java.lang.Number) => Some(bucketHashLong(x.longValue()))
      case (LongType | TimestampType, x: java.lang.Number) =>
        Some(bucketHashLong(x.longValue()))
      case (StringType, s: org.apache.spark.unsafe.types.UTF8String) =>
        Some(bucketHashString(s.toString))
      case (StringType, s: String) => Some(bucketHashString(s))
      case _ => None
    }
    h.map(x => (x & Int.MaxValue) % n)
  }

  /** [lo, hi] of the SOURCE column (inclusive, in MetricsPruning's
    * norm space: BigDecimal epoch days for DateType sources, BigDecimal
    * UTC micros for TimestampType) implied by temporal transform value
    * `v` (units from epoch per the spec: day→days, month→months,
    * year→years, hour→hours). None when the combination is undefined
    * (hour of a date) or the value is out of calendar range — callers
    * keep the file. */
  def temporalRange(t: Transform, v: Long, dt: DataType)
      : Option[(BigDecimal, BigDecimal)] = {
    val MicrosPerDay = 86400000000L
    def dayRange(startDay: Long, endDayExcl: Long) = dt match {
      case DateType =>
        Some((BigDecimal(startDay), BigDecimal(endDayExcl - 1)))
      case TimestampType =>
        Some((BigDecimal(startDay) * MicrosPerDay,
          BigDecimal(endDayExcl) * MicrosPerDay - 1))
      case _ => None
    }
    t match {
      case Day => dayRange(v, v + 1)
      case Hour => dt match {
        case TimestampType =>
          Some((BigDecimal(v) * 3600000000L,
            BigDecimal(v + 1) * 3600000000L - 1))
        case _ => None
      }
      case Month =>
        scala.util.Try {
          val start = java.time.LocalDate.of(
            Math.toIntExact(1970L + Math.floorDiv(v, 12L)),
            Math.toIntExact(Math.floorMod(v, 12L)) + 1, 1)
          (start.toEpochDay, start.plusMonths(1).toEpochDay)
        }.toOption.flatMap { case (s, e) => dayRange(s, e) }
      case Year =>
        scala.util.Try {
          val start = java.time.LocalDate.of(
            Math.toIntExact(1970L + v), 1, 1)
          (start.toEpochDay, start.plusYears(1).toEpochDay)
        }.toOption.flatMap { case (s, e) => dayRange(s, e) }
      case _ => None
    }
  }

  /** The smallest string known to be STRICTLY ABOVE every string with
    * prefix `p` in unsigned-UTF-8 order: the prefix with its last char
    * incremented (code-point order is preserved by UTF-8). Only safe
    * below the surrogate range; prefixes ending higher return None and
    * the upper bound stays open (conservative — a kept file, never a
    * wrong prune). */
  def stringPrefixUpper(p: String): Option[String] =
    if (p.isEmpty) None
    else {
      val c = p.charAt(p.length - 1)
      if (c < 0xD7FF.toChar)
        Some(p.substring(0, p.length - 1) + (c + 1).toChar)
      else None
    }

  /** [lo, hi] of the source column implied by truncate[W] value `v`:
    * ints/longs partition into [v, v + W - 1] (the spec's floored
    * `v - (v mod W)` makes v the range's low end for negatives too);
    * strings into the prefix range. hi may be None (open above). */
  def truncateRange(w: Int, raw: Any, dt: DataType)
      : Option[(Option[Any], Option[Any])] = (dt, raw) match {
    case (IntegerType | ShortType | ByteType | LongType,
        x: java.lang.Number) =>
      Some((Some(BigDecimal(x.longValue())),
        Some(BigDecimal(x.longValue()) + (w - 1))))
    case (StringType, s: String) =>
      Some((Some(s), stringPrefixUpper(s)))
    case _ => None
  }

  // Java-clean bucket-index bodies shared by the interpreted eval and
  // the generated code of [[IcebergBucketIndex]] (the TextExpressions
  // one-implementation discipline)
  def bucketIndexLong(v: Long, n: Int): Int =
    (bucketHashLong(v) & Int.MaxValue) % n
  def bucketIndexUtf8(s: org.apache.spark.unsafe.types.UTF8String,
      n: Int): Int =
    // UTF8String.getBytes IS the UTF-8 byte form Appendix B hashes
    (murmur3x86_32(s.getBytes) & Int.MaxValue) % n
}

/** Codegen'd `bucket[N]` index — the WRITE-path twin of the planner's
  * [[IcebergTransforms.bucketOf]]: (murmur3_x86_32(Appendix-B bytes) &
  * Int.MaxValue) % n over a LONG (every integral/temporal source,
  * lowered to its 8-byte value by the caller exactly as the planner
  * does) or a STRING. The repo's per-row standard: foreign
  * bucket-partitioned appends evaluate this once per appended row, so
  * it compiles into whole-stage codegen instead of paying UDF
  * boxing/serialization per row. */
private[graft] case class IcebergBucketIndex(
    child: org.apache.spark.sql.catalyst.expressions.Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n > 0, s"bucket count must be positive: $n")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects bigint or string (lower temporals to " +
            s"their 8-byte long form first), got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = v match {
    case l: java.lang.Long => IcebergTransforms.bucketIndexLong(l, n)
    case s: org.apache.spark.unsafe.types.UTF8String =>
      IcebergTransforms.bucketIndexUtf8(s, n)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val body = child.dataType match {
      case LongType => (c: String) =>
        s"graft.sources.IcebergTransforms.bucketIndexLong($c, $n)"
      case _ => (c: String) =>
        s"graft.sources.IcebergTransforms.bucketIndexUtf8($c, $n)"
    }
    defineCodeGen(ctx, ev, body)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : IcebergBucketIndex = copy(child = newChild)
}
