package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, and per-partition feature
  * extraction.
  *
  * The pixel/sample decode is REAL wherever a decoder exists: 24-bit BMP
  * pixel rows, PPM images, and 16-bit PCM WAV samples are decoded
  * byte-for-byte ([[MediaCodecs.decodeUnits]], oracle-checked by
  * m03/m04), and PNG/JPEG decode through the JDK's built-in ImageIO
  * ([[ImageIoCodec]], oracle-checked by m05 — java.desktop ships these
  * two codecs, no vendoring needed). Only formats with no JDK decoder
  * (MP3, H.264, …) fall back to the clearly-marked `decodeStub`
  * histogram. Container/header parsing (PNG dimensions, WAV audio
  * format, AVI video header) is likewise real ([[MediaCodecs]], m02).
  * The Spark-side plumbing is the real thing throughout: schema, binary
  * payload handling, partition-wise batch processing via `mapPartitions`
  * (the JVM analog of `mapInPandas` batch UDFs), and stride-based frame
  * sampling.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Derive a deterministic media table from the documents corpus: payload
    * = UTF-8 bytes, metadata from modular arithmetic on the id (pure
    * integer math so a DuckDB oracle can re-derive it — see
    * m01_media_meta). Stands in for a real binary ingest while keeping
    * every downstream op testable.
    */
  def deriveMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        // pmod like the kind expression above: signed % on a negative id
        // would emit zero/negative dimensions and durations that feed the
        // resize division and the header serializers garbage
        (pmod(col("doc_id") * 37, lit(1920)) + 1).cast("int").as("width"),
        (pmod(col("doc_id") * 53, lit(1080)) + 1).cast("int").as("height"),
        (pmod(col("doc_id") * 97, lit(600000)) + 1).as("duration_ms")).as("meta"))

  val FeatureDim = 16

  /** STUB decode: the fallback for formats that genuinely need a codec this
    * container lacks (MP3, H.264, …) — features are a deterministic
    * 16-bin byte histogram, L1-normalized. Signature and batch shape match
    * what a real decoder would use. Decodable formats never reach this:
    * [[decodeFeatures]] dispatches BMP/PPM/PCM-WAV to the byte decoders
    * and PNG/JPEG to the JDK ImageIO decode first.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (payload == null || payload.isEmpty) return hist
    payload.foreach { b => hist((b & 0xff) % FeatureDim) += 1f }
    val total = payload.length.toFloat
    hist.map(_ / total)
  }

  private def hist16(bins: Iterator[Int], n: Int): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    bins.foreach(b => hist(b) += 1f)
    if (n > 0) hist.map(_ / n.toFloat) else hist
  }

  /** Feature decode on REAL bytes wherever a decoder exists: 24-bit BMP /
    * PPM / PNG / JPEG → 16-bin histogram of decoded pixel channel values
    * (bin = v ≫ 4); 16-bit PCM WAV → 16-bin amplitude histogram over the
    * full signed range (bin = (s+32768) ≫ 12); both L1-normalized. BMP,
    * PPM and WAV decode byte-for-byte ([[MediaCodecs.decodeUnits]]); PNG
    * and JPEG go through the JDK's built-in ImageIO
    * ([[ImageIoCodec.decodeImageUnits]] — no vendored codec needed). Only
    * formats with no JDK decoder (MP3, H.264, …) fall back to
    * [[decodeStub]].
    */
  def decodeFeatures(payload: Array[Byte]): Array[Float] =
    MediaCodecs.decodeUnits(payload)
      .orElse(ImageIoCodec.decodeImageUnits(payload)) match {
      case Some(("wav", units)) =>
        hist16(units.iterator.map(s => (s + 32768) >> 12), units.length)
      case Some((_, units)) => // bmp | ppm | png | jpeg: 8-bit channel units
        hist16(units.iterator.map(_ >> 4), units.length)
      case _ => decodeStub(payload)
    }

  /** Partition-wise feature extraction — the expensive decode runs once per
    * row inside a partition iterator (no per-row task overhead, no
    * driver-side collect), producing (media_id, kind, features).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            decodeFeatures(payload).toSeq)
        }
      }(encoder)
  }

  /** Stride-based frame sampling: pick `n` evenly spaced byte offsets from
    * the payload (the shape of video frame sampling; a real decoder would
    * seek keyframes).
    */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    // n = 0 would build sequence(0, -1) = [0, -1] (Spark sequences DESCEND
    // when start > stop) and divide by zero under the ANSI gate
    require(n >= 1, s"frameSample: frame count must be >= 1, got $n")
    media.select(
      col("media_id"),
      transform(sequence(lit(0), lit(n - 1)), i =>
        col("payload").substr(
          (i * greatest(length(col("payload")), lit(1)) / n + 1).cast("int"), lit(1))
      ).as("sampled_frames"))
  }

  /** Resize metadata transform (decode-free): new dimensions preserving
    * aspect ratio against a max edge — metadata math is real even though
    * pixel work is stubbed.
    */
  def resizeMeta(media: DataFrame, maxEdge: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    // missing or non-positive dimensions propagate as NULL output, never a
    // fabricated size: greatest() SKIPS nulls, so the unguarded form turned
    // (null, 500) metadata into a confident 1-px edge, and a 0×0 row threw
    // DIVIDE_BY_ZERO under the ANSI gate. The predicate is null when either
    // dim is null (→ otherwise arm), false when non-positive.
    val valid = w > 0 && h > 0
    val scale = least(lit(maxEdge) / greatest(w, h), lit(1.0))
    // floor at 1 px: an extreme aspect ratio (1×1000 at maxEdge 100) would
    // otherwise round the short edge to a 0-dimension no real resize emits
    media.select(col("media_id"),
      when(valid, greatest(round(w * scale), lit(1.0)).cast("int")).as("new_width"),
      when(valid, greatest(round(h * scale), lit(1.0)).cast("int")).as("new_height"))
  }
}
