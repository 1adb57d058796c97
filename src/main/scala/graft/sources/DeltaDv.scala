package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.CRC32

import org.roaringbitmap.RoaringBitmap

/** Delta Lake DELETION-VECTOR codec, following the public Delta protocol
  * (delta-io PROTOCOL.md, "Deletion Vectors"): a DV is a set of 64-bit
  * row indexes stored as a RoaringBitmapArray in its "portable" layout —
  * `[numBitmaps: int64 LE]`, then per NON-EMPTY bucket in ascending key
  * order `[key: int32 LE][32-bit RoaringBitmap]`, where bucket k holds
  * the low-32 bits of every index whose high-32 bits equal k, each
  * bitmap in the standard RoaringFormatSpec serialization (the
  * org.roaringbitmap wire format Spark already ships; byte-identical to
  * Roaring64NavigableMap.serializePortable) — wrapped in a DV blob
  * `[size: int32 BE][magic 1681511377: int32 LE][portable bitmaps]
  * [CRC-32 of the data: int32 BE]` inside a file whose first byte is the
  * format version (1). Descriptors reference a blob by `storageType`:
  *   - `u` — pathOrInlineDv = `<optional prefix><z85 of the 16-byte
  *     uuid>`; the blob lives at `<prefix>/deletion_vector_<uuid>.bin`
  *     under the table root;
  *   - `p` — pathOrInlineDv is an absolute path;
  *   - `i` — pathOrInlineDv is the z85-encoded data itself (no file).
  *
  * Both halves of the interop route through this one object — the mirror
  * EXPORTS graft MOR state as spec DV blobs, and [[LakehouseTable
  * .readDeltaExport]] decodes foreign descriptors back to (file, row
  * index) sets for the same anti-join the native read path uses — so the
  * writer and reader cannot fork. */
object DeltaDv {

  /** DV blob magic (PROTOCOL.md). */
  val Magic = 1681511377

  /** Parsed descriptor of an `add` action's deletionVector field. */
  case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Long, sizeInBytes: Long, cardinality: Long)

  // --- Z85 (ZeroMQ base-85, the alphabet Delta uses for uuids/inline) ---

  private val Z85Alphabet =
    ("0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toCharArray
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85-encode; input length must be a multiple of 4 (the uuid form is
    * 16 bytes → 20 chars; inline callers pad and carry the true size in
    * `sizeInBytes`). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85 input must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div >= 1) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 text must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = ((v >> 24) & 0xff).toByte
      out(o + 1) = ((v >> 16) & 0xff).toByte
      out(o + 2) = ((v >> 8) & 0xff).toByte
      out(o + 3) = (v & 0xff).toByte
      i += 5
    }
    out
  }

  // --- RoaringBitmapArray portable form -----------------------------------

  /** Serialize sorted-or-not 64-bit row indexes as the portable
    * RoaringBitmapArray layout: `[numBitmaps: i64 LE]` then, per
    * NON-EMPTY bucket in ascending key order, `[key: i32 LE][standard
    * 32-bit RoaringBitmap]`. This is byte-compatible with
    * `Roaring64NavigableMap.serializePortable` (the interop target —
    * empty buckets are never written and each bucket is prefixed by its
    * high-32 key; a dense keyless sequence is NOT parseable by real
    * Delta readers). */
  def serializeRoaringArray(positions: Array[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "row indexes must be non-negative")
    val buckets = positions.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
      .map { case (k, ps) =>
        val rb = new RoaringBitmap()
        ps.foreach(p => rb.add(p.toInt))
        rb.runOptimize()
        (k, rb)
      }
    val size = 8 + buckets.map { case (_, rb) => 4 + rb.serializedSizeInBytes() }.sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(buckets.length.toLong)
    buckets.foreach { case (k, rb) => bb.putInt(k); rb.serialize(bb) }
    bb.array()
  }

  def deserializeRoaringArray(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val numBitmaps = bb.getLong
    require(numBitmaps >= 0 && numBitmaps <= Int.MaxValue,
      s"bad bitmap count $numBitmaps")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var n = 0L
    while (n < numBitmaps) {
      val key = bb.getInt // the bucket's high-32 bits; buckets may be sparse
      require(key >= 0, s"negative bucket key $key in DV bitmap")
      val rb = new RoaringBitmap()
      rb.deserialize(bb)
      // deserialize(ByteBuffer) does not advance the buffer; skip manually
      bb.position(bb.position() + rb.serializedSizeInBytes())
      val hi = key.toLong << 32
      rb.forEach(new org.roaringbitmap.IntConsumer {
        override def accept(v: Int): Unit = out += (hi | (v & 0xffffffffL))
      })
      n += 1
    }
    out.toArray
  }

  // --- Blob files ----------------------------------------------------------

  private def blobBytes(positions: Array[Long]): (Array[Byte], Array[Byte]) = {
    val bitmaps = serializeRoaringArray(positions)
    val data = ByteBuffer.allocate(4 + bitmaps.length)
      .order(ByteOrder.LITTLE_ENDIAN)
      .putInt(Magic).put(bitmaps).array()
    val crc = new CRC32(); crc.update(data)
    val blob = ByteBuffer.allocate(4 + data.length + 4) // BE by default
      .putInt(data.length).put(data).putInt(crc.getValue.toInt).array()
    (blob, data)
  }

  /** Write `positions` as a spec DV file `deletion_vector_<uuid>.bin`
    * under `root`, returning the descriptor. The uuid derives
    * DETERMINISTICALLY from `seed` (md5), so concurrent exporters of the
    * same version produce the same file and the atomic-move race is
    * idempotent. */
  def writeDvFile(root: String, seed: String,
      positions: Array[Long]): Descriptor = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8"))
    // set the RFC-4122 version/variant bits so the uuid is well-formed
    md5(6) = ((md5(6) & 0x0f) | 0x30).toByte
    md5(8) = ((md5(8) & 0x3f) | 0x80).toByte
    val bb = ByteBuffer.wrap(md5)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val (blob, data) = blobBytes(positions)
    val target = Paths.get(root).resolve(s"deletion_vector_$uuid.bin")
    val bytes = new Array[Byte](1 + blob.length)
    bytes(0) = 1 // format version
    System.arraycopy(blob, 0, bytes, 1, blob.length)
    val tmp = Files.createTempFile(Paths.get(root), ".dv-tmp", ".bin")
    Files.write(tmp, bytes)
    try Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp) // deterministic content; the winner's is equal
    }
    Descriptor("u", z85Encode(md5), offset = 1L,
      sizeInBytes = data.length.toLong, cardinality = positions.length.toLong)
  }

  /** The ON-DISK file a descriptor's blob lives in, for the file forms
    * ("p" absolute, "u" uuid-relative under the table root); None for
    * inline. The path half of [[readPositions]]'s resolution, exposed
    * so maintenance (vacuum's protect set) shares the exact rules. */
  def filePath(root: String, d: Descriptor): Option[Path] = d.storageType match {
    case "p" => Some(Paths.get(d.pathOrInlineDv))
    case "u" =>
      // last 20 chars are the z85 uuid; anything before is an
      // optional directory prefix (the spec's random-prefix layout)
      val s = d.pathOrInlineDv
      require(s.length >= 20, s"bad uuid DV reference '$s'")
      val (prefix, enc) = s.splitAt(s.length - 20)
      val raw = z85Decode(enc)
      val bb = ByteBuffer.wrap(raw)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val dir = if (prefix.isEmpty) Paths.get(root)
                else Paths.get(root).resolve(prefix.stripSuffix("/"))
      Some(dir.resolve(s"deletion_vector_$uuid.bin"))
    case _ => None
  }

  /** Decode a descriptor back to its 64-bit row indexes, resolving the
    * blob per storageType and verifying magic + size (+ CRC for file
    * forms). */
  def readPositions(root: String, d: Descriptor): Array[Long] = {
    val data: Array[Byte] = d.storageType match {
      case "i" =>
        val raw = z85Decode(d.pathOrInlineDv)
        require(raw.length >= d.sizeInBytes,
          s"inline DV shorter than sizeInBytes (${raw.length} < ${d.sizeInBytes})")
        java.util.Arrays.copyOfRange(raw, 0, d.sizeInBytes.toInt)
      case "u" | "p" =>
        val path: Path = filePath(root, d).get
        val bytes = Files.readAllBytes(path)
        val off = d.offset.toInt
        val size = ByteBuffer.wrap(bytes, off, 4).getInt // BE
        require(size == d.sizeInBytes,
          s"DV blob size $size != descriptor sizeInBytes ${d.sizeInBytes} at $path")
        val data = java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + size)
        val crc = new CRC32(); crc.update(data)
        val stored = ByteBuffer.wrap(bytes, off + 4 + size, 4).getInt
        require(stored == crc.getValue.toInt,
          s"DV blob checksum mismatch at $path")
        data
      case other =>
        throw new IllegalArgumentException(s"unknown DV storageType '$other'")
    }
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt == Magic, "bad DV magic")
    deserializeRoaringArray(java.util.Arrays.copyOfRange(data, 4, data.length))
  }
}
