package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (north-star mandate): media as opaque BINARY
  * payloads + typed metadata, with decode/feature-extraction as batched
  * per-partition transforms.
  *
  * The actual byte decoding (image/audio codecs) is STUBBED — the container
  * ships no media libraries — behind [[DecodeStub]], a deterministic fake.
  * Everything around it is real and tested: the schema (binary + struct
  * metadata), the partitioning (repartition by media kind so one executor
  * batch holds one codec's work), the batched mapPartitions shape (amortize
  * per-batch codec init, exactly how a Pandas-UDF/mapInPandas pipeline is
  * laid out), and the oracle-checked binary column semantics.
  */
object Multimodal {

  /** A media row: payload is the raw bytes, kind ∈ {image,audio,video}. */
  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      lang: String, n_chars: Long)

  /** Decoded features. In a real pipeline width/height/duration come from
    * the codec; the stub derives them deterministically from the payload. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
      checksum: String, width: Int, height: Int)

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * features are pure functions of payload bytes + metadata. A real
    * implementation would replace ONLY this object (same batch shape). */
  object DecodeStub {
    /** Per-partition "codec" handle; real codecs are expensive to init, so
      * the shape is one init per partition, reused across the batch. */
    def open(): java.security.MessageDigest = java.security.MessageDigest.getInstance("MD5")

    def decode(codec: java.security.MessageDigest, row: MediaRow): MediaFeatures = {
      codec.reset()
      val digest = codec.digest(row.payload)
      val hex = digest.map(b => f"$b%02x").mkString
      MediaFeatures(row.doc_id, row.kind, row.payload.length, hex,
        width = (row.n_chars % 640).toInt, height = (row.doc_id % 480).toInt)
    }
  }

  /** The media table: documents' text bytes as the stand-in payload, kind
    * assigned round-robin — schema-faithful plumbing over real columns. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        col("lang"), col("n_chars"))
      .as[MediaRow]
  }

  /** Batched decode: repartition by kind (codec-affinity), one codec init
    * per partition, compiled loop over the batch. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("kind"))
      .mapPartitions { batch =>
        val codec = DecodeStub.open()
        batch.map(row => DecodeStub.decode(codec, row))
      }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary-column semantics, oracle-checked: byte length + md5 checksum
    // of the payload and the deterministic stub dimensions.
    "q43_multimodal_features" -> ((s, d) => {
      decodeAll(mediaTable(s, d)).toDF()
        .select(col("doc_id"), col("kind"), col("n_bytes"), col("checksum"),
          col("width"), col("height"))
        .orderBy(col("doc_id"))
    }),

    "q58_frame_sample" -> (frameSampleQuery _),

    // Windowed-signal analysis over "audio" payloads: fixed 16-byte windows
    // with stride 8 (50% overlap), per-window energy = integer sum of the
    // sample bytes and peak = max byte — the STFT-like 1→N windowing shape.
    // Integer math only: deterministic in any engine; real sample decode
    // would replace only the byte-read, not the windowing plumbing.
    "q77_audio_windows" -> ((s, d) => {
      val winLen = 16
      val stride = 8
      // full windows only: window i covers [i*stride+1, i*stride+winLen]
      val nWins = (floor((length(col("text")) - winLen) / stride) + 1).cast("int")
      val bytes = transform(sequence(lit(1), lit(winLen)),
        i => ascii(col("chunk").substr(i, lit(1))))
      Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 1) // the "audio" rows of mediaTable
        .filter(length(col("text")) >= winLen)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), nWins - 1)).as("win_idx"))
        .select(col("doc_id"), col("win_idx").cast("long").as("win_idx"),
          col("text").substr(col("win_idx") * stride + 1, lit(winLen)).as("chunk"))
        .select(col("doc_id"), col("win_idx"),
          aggregate(bytes, lit(0L), (acc, x) => acc + x).as("energy"),
          array_max(bytes).cast("long").as("peak"))
        .orderBy(col("doc_id"), col("win_idx"))
    }))

  /** Frame sampling: each "video" payload yields 4 evenly-spaced frames
    * (here: quarters of the payload, checksummed) — the 1-to-many decode
    * shape (posexplode) a real frame sampler has. Deterministic slicing
    * stands in for codec frame extraction; the row-explosion, frame
    * indexing, and per-frame feature schema are the real plumbing. */
  def frameSampleQuery(s: SparkSession, d: String): DataFrame = {
    val frames = array((0 until 4).map(k =>
      expr(s"md5(substring(text, 1 + $k * (length(text) div 4), length(text) div 4))")): _*)
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), posexplode(frames).as(Seq("frame_idx", "frame_md5")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  def oracle: Map[String, String] = Map(
    "q43_multimodal_features" ->
      """SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           ELSE 'video' END AS kind,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         md5(text) AS checksum,
         CAST(n_chars % 640 AS INT) AS width,
         CAST(doc_id % 480 AS INT) AS height
         FROM documents ORDER BY doc_id""",

    "q77_audio_windows" ->
      """WITH a AS (SELECT doc_id, text,
                      CAST(floor((length(text) - 16) / 8) AS BIGINT) + 1 AS nw
                    FROM documents WHERE doc_id % 3 = 1 AND length(text) >= 16),
          w AS (SELECT doc_id, text, unnest(range(0, nw)) AS win_idx FROM a),
          c AS (SELECT doc_id, win_idx,
                  substring(text, CAST(win_idx * 8 + 1 AS INT), 16) AS chunk FROM w)
         SELECT doc_id, win_idx,
           CAST(list_sum(list_transform(range(1, 17),
             i -> ascii(substring(chunk, CAST(i AS INT), 1)))) AS BIGINT) AS energy,
           CAST(list_max(list_transform(range(1, 17),
             i -> ascii(substring(chunk, CAST(i AS INT), 1)))) AS BIGINT) AS peak
         FROM c ORDER BY doc_id, win_idx""",

    "q58_frame_sample" ->
      """SELECT doc_id, k AS frame_idx,
         md5(substring(text, 1 + CAST(k AS INT) * (length(text) // 4),
             length(text) // 4)) AS frame_md5
         FROM documents, (SELECT unnest(range(0, 4)) AS k)
         WHERE doc_id % 3 = 2
         ORDER BY doc_id, frame_idx""")
}
