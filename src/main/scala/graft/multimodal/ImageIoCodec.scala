package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL PNG/JPEG pixel decode via the JDK's built-in `javax.imageio`
  * (java.desktop ships PNG and JPEG readers/writers — no vendored codec,
  * no external dependency), closing the last documented decode stub:
  * earlier rounds assumed "this container has no codecs", but the stock
  * JDK is one for exactly these two formats.
  *
  * Part of the beyond-reference training-data pipeline layer (multimodal
  * columns), with the same two-halves discipline as [[MediaCodecs]]:
  *
  *  - [[plantPng]] ENCODES deterministic pixels (the m04 serializer's
  *    `(id·11 + k) % 256` formula, row-major R,G,B) through the JDK PNG
  *    writer — lossless, so the decoded units must reproduce the formula
  *    exactly;
  *  - [[decodeImageUnits]] DECODES any PNG/JPEG payload back to channel
  *    units with `ImageIO.read` inside `mapPartitions`.
  *
  * The m05 oracle predicts count/sum/position-weighted sum from the same
  * arithmetic (one SQL expression, no image code in DuckDB), which pins
  * the WHOLE encode→PNG→decode round trip; the decoder's channel order
  * and row orientation are additionally grounded against a HAND-CRAFTED
  * golden PNG (built byte-by-byte from the PNG spec with `Deflater` +
  * `CRC32`, independent of ImageIO) in `ImageIoCodecSpec`. JPEG at
  * default quality is lossy (m06 pins its structural outputs exactly and
  * ImageIoCodecSpec bounds its gradient reconstruction error), but
  * per-block-UNIFORM grayscale content at writer quality 1.0 is
  * bit-exact — DC-only blocks against all-ones quantization tables, no
  * chroma conversion — which is what [[plantJpegQ100]] exploits to give
  * the JPEG decode a full first-principles oracle (m06b).
  */
object ImageIoCodec {

  // Executors have no display; the JDK image pipeline must never try to
  // touch one. Disk-caching ImageIO streams would also add a temp-file
  // write per decoded row — keep it all in memory.
  private lazy val init: Unit = {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  /** The shared pixel formula: channel unit k of media `id` is
    * `(id·11 + k) % 256`, k running row-major, R,G,B within a pixel —
    * the same family the PPM serializer uses, so the m05 oracle is the
    * m04 oracle with `format = 'png'`.
    */
  def formulaUnit(id: Long, k: Long): Int = ((id * 11 + k) % 256).toInt

  /** Encode one deterministic w×h image as PNG bytes via the JDK writer. */
  def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    init
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y.toLong * w + x) * 3
        img.setRGB(x, y,
          (formulaUnit(id, p) << 16) | (formulaUnit(id, p + 1) << 8) |
            formulaUnit(id, p + 2))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Exact-JPEG pixel formula: the gray value of every pixel in 8×8 block
    * `blk` (row-major block index) of media `id` is `(id·31 + blk·7) % 256`,
    * replicated to R,G,B by the decoder's gray path. Per-block-UNIFORM
    * content is DC-only after the forward DCT, and at writer quality 1.0
    * the quantization tables are all ones — so the decode reproduces the
    * formula bit-exactly (no chroma conversion either: the image is
    * single-component grayscale). Proven across all 256 values and
    * multi-block/partial-edge sizes in ImageIoCodecSpec; the m06b oracle
    * re-derives the aggregates from this same arithmetic in DuckDB.
    */
  def jpegExactUnit(id: Long, blk: Int): Int = ((id * 31 + blk * 7) % 256).toInt

  /** Encode one per-block-uniform grayscale image as a quality-1.0
    * baseline JPEG — the EXACT-roundtrip fixture (see [[jpegExactUnit]]).
    * Needs the explicit-quality writer path: `ImageIO.write`'s default
    * quality (0.75) quantizes the DC coefficients and breaks exactness.
    */
  def encodeJpegQ100(id: Long, w: Int, h: Int): Array[Byte] = {
    init
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val bw = (w + 7) / 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.getRaster.setSample(x, y, 0, jpegExactUnit(id, (y / 8) * bw + x / 8))
        x += 1
      }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Encode a SMOOTH gradient (not the mod-256 ramp — JPEG quantization
    * error explodes on high-frequency content) as JPEG bytes; used by the
    * lossy-path spec only.
    */
  def encodeJpegGradient(w: Int, h: Int): Array[Byte] = {
    init
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = if (w > 1) x * 255 / (w - 1) else 0
        val g = if (h > 1) y * 255 / (h - 1) else 0
        img.setRGB(x, y, (r << 16) | (g << 8) | 128)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Decoded channel units from real PNG/JPEG bytes —
    * Some((format, units)) with units row-major top-down, R,G,B within a
    * pixel (the [[MediaCodecs.decodeUnits]] PPM convention). Null-safe:
    * wrong magic, truncated/corrupt streams, or images past the size
    * guards yield None, never an exception (same contract as the byte
    * decoders — one bad file cannot kill a 100 TB pipeline stage).
    */
  def decodeImageUnits(payload: Array[Byte]): Option[(String, Array[Int])] = {
    if (payload == null || payload.length < 8) return None
    val fmt =
      if (payload.take(8).sameElements(PngMagic)) "png"
      else if ((payload(0) & 0xff) == 0xFF && (payload(1) & 0xff) == 0xD8 &&
        (payload(2) & 0xff) == 0xFF) "jpeg"
      else return None
    init
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) return None // registered reader refused the stream
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
        w.toLong * h * 3 > (1L << 26)) return None
      val units = new Array[Int](w * h * 3)
      val gray = img.getRaster.getNumBands == 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          if (gray) {
            // single-component image: the raster sample IS the gray level;
            // getRGB would instead run the JDK's gray→sRGB ICC conversion
            // (a gamma curve — raster 1 reads back as RGB 13), destroying
            // the exact-roundtrip contract the q100 fixture provides
            val v = img.getRaster.getSample(x, y, 0) & 0xff
            units(p) = v; units(p + 1) = v; units(p + 2) = v
          } else {
            val rgb = img.getRGB(x, y) // ARGB regardless of the raster layout
            units(p) = (rgb >> 16) & 0xff
            units(p + 1) = (rgb >> 8) & 0xff
            units(p + 2) = rgb & 0xff
          }
          x += 1
        }
        y += 1
      }
      Some((fmt, units))
    } catch {
      // ImageIO readers throw IIOException/IndexOutOfBounds on truncated
      // or hostile streams — malformed input is a null row, not a failure
      case _: Exception => None
    }
  }

  private def plantWith(media: DataFrame,
      dims: Long => (Int, Int) = id => ((1 + id % 5).toInt, (1 + id % 4).toInt))
      (enc: (Long, Int, Int) => Array[Byte]): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val kind = r.getAs[String]("kind")
          val payload =
            if (kind == "image") { val (w, h) = dims(id); enc(id, w, h) }
            else r.getAs[Array[Byte]]("payload")
          Row(id, kind, payload)
        }
      }(encoder)
  }

  /** Replace image payloads with real JDK-encoded PNGs at the same planted
    * dimensions as the BMP/PPM serializers ((1+id%5)×(1+id%4)). Encode
    * runs partition-wise like every decode: an image codec in a column
    * expression would serialize the codec per task — mapPartitions is the
    * honest shape for both directions.
    */
  def plantPng(media: DataFrame): DataFrame =
    plantWith(media)(encodePng)

  /** Replace image payloads with real JDK-encoded JPEGs (smooth gradient
    * content) at the planted dimensions. JPEG is lossy, so only the
    * decode's STRUCTURAL outputs are exactly predictable — format and
    * n_units = w·h·3 — which is precisely what the m06 oracle pins;
    * reconstruction error is bounded separately in ImageIoCodecSpec.
    */
  def plantJpeg(media: DataFrame): DataFrame =
    plantWith(media)((_, w, h) => encodeJpegGradient(w, h))

  /** Replace image payloads with quality-1.0 per-block-uniform grayscale
    * JPEGs — the EXACT-roundtrip fixture (see [[encodeJpegQ100]]). Larger
    * planted dimensions than the other serializers ((1+id%12)×(1+id%10),
    * up to 4 blocks per image) so multi-block indexing and partial
    * edge-block padding are on the oracle'd path, not just the spec'd one.
    */
  def plantJpegQ100(media: DataFrame): DataFrame =
    plantWith(media, id => ((1 + id % 12).toInt, (1 + id % 10).toInt))(
      encodeJpegQ100)

  /** Batch ImageIO decode → the same per-payload aggregates as
    * [[MediaCodecs.decodeContent]] (shared [[MediaCodecs.unitAggRow]]).
    */
  def decodeImageContent(media: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(MediaCodecs.ContentSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          MediaCodecs.unitAggRow(r.getAs[Long]("media_id"),
            decodeImageUnits(r.getAs[Array[Byte]]("payload")))
        }
      }(encoder)
  }
}
