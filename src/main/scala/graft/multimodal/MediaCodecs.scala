package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL byte-format decode for the codec-free slice of the multimodal
  * contract: container/header parsing (PNG dimensions, WAV audio format,
  * AVI video header) needs no image/audio codec — just byte arithmetic —
  * fully real and oracle-checked. Pixel/sample decode is ALSO real for
  * BMP, 16-bit PCM WAV, and PPM here (byte-exact, m03/m04) and for
  * PNG/JPEG via the JDK's built-in ImageIO ([[ImageIoCodec]], m05/m06/
  * m06b); `Multimodal.decodeStub` remains only for formats this
  * container ships no JDK codec for (MP3, H.264-class video).
  *
  * Two halves, deliberately independent:
  *
  *  - [[plantHeaders]] SERIALIZES metadata into spec-conformant header
  *    bytes with pure column ops (`hex`/`unhex`/`concat` — endianness as
  *    hex-pair shuffles), prepended to the payload;
  *  - [[parseHeaders]] PARSES bytes back with a ByteBuffer reader inside
  *    `mapPartitions` — magic-number dispatch, chunk walk for RIFF/WAVE,
  *    the exact shape a real decoder integration has (no per-row task
  *    overhead, nulls for malformed input).
  *
  * The m02 oracle closes the loop: DuckDB predicts every parsed field
  * from first-principles integer arithmetic on `media_id`, so a parser
  * reading the wrong offset or endianness hash-mismatches immediately.
  */
object MediaCodecs {

  // --- column-space serializers --------------------------------------------

  /** Refuse out-of-range field values LOUDLY: `lpad` TRUNCATES to the first
    * `hexDigits` chars when the hex is longer, so a negative value (16 hex
    * digits) or one ≥ 2^(4·hexDigits) would serialize a structurally valid
    * but numerically wrong header with no error — a ~7.5 h WAV's RIFF size,
    * for instance, would silently wrap. A serializer must fail on garbage
    * in, not emit corrupt bytes.
    */
  private def checkedHex(x: Column, hexDigits: Int): Column = {
    val v = x.cast("long")
    val ok = v >= 0L && v < (1L << (4 * hexDigits))
    when(ok, lpad(hex(v), hexDigits, "0"))
      .otherwise(raise_error(format_string(
        s"media header field out of range [0, 2^${4 * hexDigits}): %s", v.cast("string"))))
  }

  /** 4-byte big-endian from a non-negative int column (< 2^32). */
  private def be4(x: Column): Column = unhex(checkedHex(x, 8))

  private def leHex(x: Column, hexDigits: Int): Column = {
    val h = checkedHex(x, hexDigits)
    // byte-reverse via hex-pair shuffle
    val pairs = (hexDigits - 1 to 1 by -2).map(i => substring(h, i, 2))
    unhex(concat(pairs: _*))
  }

  /** 4-/2-byte little-endian from a non-negative int column. */
  private def le4(x: Column): Column = leHex(x, 8)
  private def le2(x: Column): Column = leHex(x, 4)

  private def ascii(s: String): Column = lit(s.getBytes("US-ASCII"))

  /** PNG signature + IHDR: width/height live at fixed offsets 16/20 as
    * 4-byte big-endian (PNG spec §5.2, §11.2.2); bit depth 8, color type
    * 6 (RGBA). The IHDR CRC is zeroed — dimension parsing never checks it.
    */
  def pngHeader(width: Column, height: Column): Column = concat(
    lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)),
    be4(lit(13)), ascii("IHDR"), be4(width), be4(height),
    lit(Array[Byte](8, 6, 0, 0, 0)), be4(lit(0)))

  /** Canonical RIFF/WAVE header: PCM fmt chunk + data chunk size
    * (everything little-endian). `dataBytes` is the declared data-chunk
    * length — duration follows as dataBytes·1000/byteRate.
    */
  def wavHeader(sampleRate: Column, channels: Column, dataBytes: Column): Column = {
    val byteRate = sampleRate * channels * lit(2) // 16-bit PCM
    concat(
      ascii("RIFF"), le4(dataBytes + lit(36)), ascii("WAVE"),
      ascii("fmt "), le4(lit(16)), le2(lit(1)), le2(channels),
      le4(sampleRate), le4(byteRate), le2(channels * lit(2)), le2(lit(16)),
      ascii("data"), le4(dataBytes))
  }

  /** Minimal RIFF/AVI: LIST hdrl with the MainAVIHeader (`avih`) laid out
    * canonically — µs-per-frame at byte 32, total frames at 48, width at
    * 64, height at 68 (all little-endian).
    */
  def aviHeader(width: Column, height: Column, microSecPerFrame: Column,
                totalFrames: Column): Column = concat(
    ascii("RIFF"), le4(lit(0)), ascii("AVI "),
    ascii("LIST"), le4(lit(4 + 8 + 56)), ascii("hdrl"),
    ascii("avih"), le4(lit(56)),
    le4(microSecPerFrame), le4(lit(0)), le4(lit(0)), le4(lit(0)),
    le4(totalFrames), le4(lit(0)), le4(lit(1)), le4(lit(0)),
    le4(width), le4(height), le4(lit(0)), le4(lit(0)), le4(lit(0)), le4(lit(0)))

  val VideoMicroSecPerFrame = 33333L // ~30 fps

  /** Serialize each media row's metadata into a real format header for its
    * kind (image→PNG, audio→WAV, video→AVI), prepended to the payload.
    * Audio fields derive deterministically from `media_id` (rate
    * 8000·(1+id%5) Hz, 1-2 channels); the WAV/AVI declared sizes encode
    * `meta.duration_ms` through the format's own integer arithmetic.
    */
  def plantHeaders(media: DataFrame): DataFrame = {
    val id = col("media_id")
    val sampleRate = (lit(8000) * (lit(1) + pmod(id, lit(5)))).cast("long")
    val channels = (lit(1) + pmod(id, lit(2))).cast("long")
    val byteRate = sampleRate * channels * lit(2)
    val dataBytes = floor(col("meta.duration_ms") * byteRate / lit(1000))
    val frames = floor(col("meta.duration_ms") * lit(1000) / lit(VideoMicroSecPerFrame))
    media.withColumn("payload",
      concat(
        when(col("kind") === "image",
          pngHeader(col("meta.width"), col("meta.height")))
          .when(col("kind") === "audio", wavHeader(sampleRate, channels, dataBytes))
          .otherwise(aviHeader(col("meta.width"), col("meta.height"),
            lit(VideoMicroSecPerFrame), frames)),
        col("payload")))
  }

  // --- real content serializers (codec-free formats) -----------------------

  /** Spec-conformant 24-bit bottom-up BMP serialized in column space, pixel
    * bytes from pure id arithmetic: the channel byte at linear index
    * k = (y·w + x)·3 + c — image coordinates, y = 0 the TOP row — is
    * (id·7 + k) % 256. File rows are stored bottom-up with 4-byte stride
    * padding, as BITMAPINFOHEADER with positive height mandates, so a
    * decoder ignoring either mismatches the m03 oracle's position-weighted
    * sum.
    */
  def bmpImage(id: Column, w: Column, h: Column): Column = {
    val rowBytes = (w * 3).cast("long")
    val rowSize = floor((w * 3 + 3) / 4).cast("long") * 4
    val pad = (rowSize - rowBytes).cast("int")
    def rowHex(yImg: Column): Column = concat(
      concat_ws("", transform(sequence(lit(0L), rowBytes - 1),
        j => lpad(hex(pmod(id * 7 + yImg * rowBytes + j, lit(256))), 2, "0"))),
      repeat(lit("00"), pad))
    val pixelHex = concat_ws("", transform(sequence(lit(0), h - 1),
      r => rowHex((h - 1 - r).cast("long"))))
    concat(
      ascii("BM"), le4(lit(54) + h.cast("long") * rowSize), le4(lit(0)), le4(lit(54)),
      le4(lit(40)), le4(w), le4(h), le2(lit(1)), le2(lit(24)),
      le4(lit(0)), le4(h.cast("long") * rowSize), le4(lit(2835)), le4(lit(2835)),
      le4(lit(0)), le4(lit(0)),
      unhex(pixelHex))
  }

  /** Spec-conformant Netpbm PPM serialized in column space — P6 (raw) or
    * P3 (ASCII decimal) chosen per row. Sample k (row-major, TOP row
    * first, no padding — PPM's geometry, deliberately opposite BMP's) is
    * (id·11 + k) % 256. Both variants carry a '#' comment line between
    * the magic and the dimensions, so a decoder that tokenizes naively
    * instead of honoring comment-to-EOL mismatches.
    */
  def ppmImage(id: Column, w: Column, h: Column, asciiVariant: Column): Column = {
    val n = (w * h * 3).cast("long")
    val sample = (k: Column) => pmod(id * 11 + k, lit(256))
    val header = concat(
      when(asciiVariant, lit("P3")).otherwise(lit("P6")),
      lit("\n# planted\n"), w.cast("string"), lit(" "), h.cast("string"),
      lit("\n255\n"))
    val asciiBody = encode(concat_ws(" ",
      transform(sequence(lit(0L), n - 1), k => sample(k).cast("string"))), "US-ASCII")
    val rawBody = unhex(concat_ws("",
      transform(sequence(lit(0L), n - 1), k => lpad(hex(sample(k)), 2, "0"))))
    concat(encode(header, "US-ASCII"),
      when(asciiVariant, asciiBody).otherwise(rawBody))
  }

  /** Replace image payloads with real PPMs — raw P6 for even ids, ASCII P3
    * for odd — at the same planted dimensions as [[plantContent]]'s BMPs.
    */
  def plantPpm(media: DataFrame): DataFrame = {
    val id = col("media_id")
    media.withColumn("payload",
      when(col("kind") === "image",
        ppmImage(id, (lit(1) + pmod(id, lit(5))).cast("int"),
          (lit(1) + pmod(id, lit(4))).cast("int"), pmod(id, lit(2)) === 1))
        .otherwise(col("payload")))
  }

  /** Canonical 16-bit mono 8 kHz PCM WAV in column space: sample t is
    * ((id·31 + t·17) % 4096) − 2048, stored little-endian two's complement.
    */
  def wavPcm(id: Column, n: Column): Column = {
    val samplesHex = concat_ws("", transform(sequence(lit(0), n - 1), t => {
      val u = pmod(pmod(id * 31 + t.cast("long") * 17, lit(4096)) - 2048, lit(65536))
      concat(lpad(hex(pmod(u, lit(256))), 2, "0"),
        lpad(hex(shiftright(u, 8)), 2, "0"))
    }))
    concat(wavHeader(lit(8000L), lit(1L), (n * 2).cast("long")), unhex(samplesHex))
  }

  /** Replace payloads with REAL decodable content: a small 24-bit BMP for
    * images ((1+id%5)×(1+id%4) pixels), 16-bit PCM WAV for audio
    * (40+id%17 samples). Dimensions are kept small because every byte is
    * materialized; the decode path is size-agnostic.
    */
  def plantContent(media: DataFrame): DataFrame = {
    val id = col("media_id")
    media.withColumn("payload",
      when(col("kind") === "image",
        bmpImage(id, (lit(1) + pmod(id, lit(5))).cast("int"),
          (lit(1) + pmod(id, lit(4))).cast("int")))
        .when(col("kind") === "audio",
          wavPcm(id, (lit(40) + pmod(id, lit(17))).cast("int")))
        .otherwise(col("payload")))
  }

  // --- the decoder-shaped parser -------------------------------------------

  val ParsedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def u16le(b: ByteBuffer, off: Int): Int = b.getShort(off) & 0xffff
  private def u32le(b: ByteBuffer, off: Int): Long = b.getInt(off) & 0xffffffffL
  private def u32be(b: ByteBuffer, off: Int): Long = {
    val o = b.order(); b.order(ByteOrder.BIG_ENDIAN)
    val v = b.getInt(off) & 0xffffffffL; b.order(o); v
  }

  /** The one RIFF sub-chunk walk (tag, chunk offset, declared size),
    * starting after the 12-byte RIFF/form header, single-sourcing the
    * safety rules both consumers need: stop when fewer than 8 header bytes
    * remain; a declared size past the payload end yields its chunk but
    * terminates the walk (we parse headers, not whole files — and a hostile
    * ~2 GB size would wrap `off + 8 + size` negative and make the tag read
    * throw); chunks are WORD-aligned, so odd sizes skip a pad byte or every
    * later tag read is off by one.
    */
  private def riffChunks(payload: Array[Byte], b: ByteBuffer): Iterator[(String, Int, Long)] =
    Iterator.unfold(12) { off =>
      if (off + 8 > payload.length) None
      else {
        val id = new String(payload, off, 4, "US-ASCII")
        val size = u32le(b, off + 4)
        val next = if (size > payload.length.toLong) payload.length
          else off + 8 + size.toInt + (size.toInt & 1)
        Some(((id, off, size), next))
      }
    }

  /** Parse one payload's header. Null-safe: unknown magic, truncated input,
    * or a missing expected chunk yields format=null / all-null fields —
    * never an exception (a decoder in a 100 TB pipeline cannot throw on
    * one bad file).
    */
  def parseHeader(payload: Array[Byte]): (Option[String], Option[Int], Option[Int],
      Option[Long], Option[Int], Option[Long]) = {
    if (payload == null || payload.length < 12)
      return (None, None, None, None, None, None)
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(payload, off, 4, "US-ASCII")

    // u32 fields that land in Int columns: a crafted value above
    // Int.MaxValue must become null, not a negative via .toInt truncation
    def i32(v: Long): Option[Int] = if (v <= Int.MaxValue) Some(v.toInt) else None

    if (payload.length >= 24 && payload.take(8).sameElements(PngMagic) &&
        tag(12) == "IHDR") {
      val w = u32be(b, 16); val h = u32be(b, 20)
      (Some("png"), i32(w), i32(h), None, None, None)
    } else if (tag(0) == "RIFF" && tag(8) == "WAVE") {
      // chunk walk ([[riffChunks]] owns the safety rules). Duration is
      // computed AFTER the walk from the recorded data-chunk size, so a
      // spec-legal file with data before fmt still gets one — the in-loop
      // form silently lost it (byteRate was still 0 at the data chunk).
      var rate = Option.empty[Long]; var ch = Option.empty[Int]
      var dataSize = Option.empty[Long]; var byteRate = 0L
      val it = riffChunks(payload, b)
      while (it.hasNext && (rate.isEmpty || dataSize.isEmpty)) {
        val (id, off, size) = it.next()
        // a declared fmt size < 16 means the PCM fields are NOT in this
        // chunk — reading them anyway would parse the NEXT chunk's bytes
        // (e.g. 24948 channels from the letters "ta" of "data") as data
        if (id == "fmt " && size >= 16 && off + 24 <= payload.length && rate.isEmpty) {
          ch = Some(u16le(b, off + 10))
          rate = Some(u32le(b, off + 12))
          byteRate = u32le(b, off + 16)
        } else if (id == "data" && dataSize.isEmpty) {
          dataSize = Some(size)
        }
      }
      if (rate.isEmpty) (None, None, None, None, None, None)
      else (Some("wav"), None, None, rate, ch,
        if (byteRate > 0) dataSize.map(_ * 1000L / byteRate) else None)
    } else if (tag(0) == "RIFF" && tag(8) == "AVI " && payload.length >= 72 &&
        tag(24) == "avih") {
      val uspf = u32le(b, 32); val frames = u32le(b, 48)
      // both u32: the product can exceed Long.MaxValue ((2^32-1)^2 ≈ 1.8e19)
      // on a crafted header — null duration, not a wrapped negative
      val dur = if (frames == 0) Some(0L)
        else if (uspf <= Long.MaxValue / frames) Some(uspf * frames / 1000L)
        else None
      (Some("avi"), i32(u32le(b, 64)), i32(u32le(b, 68)), None, None, dur)
    } else (None, None, None, None, None, None)
  }

  // --- real content decode (codec-free formats) ----------------------------

  /** Raw decoded content units from real bytes — Some(("bmp", channel bytes
    * 0..255 in image coordinates, top row first)) for 24-bit uncompressed
    * BMP, Some(("wav", signed 16-bit samples)) for 16-bit PCM WAVE, None
    * for anything needing an actual codec. Null-safe like [[parseHeader]]:
    * truncated or malformed input yields None, never an exception.
    */
  def decodeUnits(payload: Array[Byte]): Option[(String, Array[Int])] = {
    if (payload == null || payload.length < 12) return None
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(payload, off, 4, "US-ASCII")

    if (payload(0) == 'B' && payload(1) == 'M' && payload.length >= 54 &&
        u16le(b, 28) == 24 && u32le(b, 30) == 0L) {
      val off = u32le(b, 10).toInt
      val w = u32le(b, 18).toInt; val h = u32le(b, 22).toInt
      val rowSize = (w * 3 + 3) / 4 * 4
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) || off < 54 ||
          off.toLong + h.toLong * rowSize > payload.length) None
      else {
        val units = new Array[Int](w * h * 3)
        var y = 0
        while (y < h) {
          // positive biHeight ⇒ file rows run bottom-up; image row y sits at
          // file row h-1-y, padded to the 4-byte stride
          val rowStart = off + (h - 1 - y) * rowSize
          var j = 0
          while (j < w * 3) {
            units(y * w * 3 + j) = payload(rowStart + j) & 0xff
            j += 1
          }
          y += 1
        }
        Some(("bmp", units))
      }
    } else if (payload(0) == 'P' && (payload(1) == '3' || payload(1) == '6') &&
               (payload(2) == '\n' || payload(2) == '\r' || payload(2) == ' ' ||
                payload(2) == '\t')) {
      // Netpbm PPM — P6 raw or P3 ASCII. Header tokens (width, height,
      // maxval) are separated by whitespace with '#'-to-EOL comments legal
      // between any of them; P6 pixel data starts after exactly ONE
      // whitespace byte following maxval, P3 samples are whitespace-
      // separated decimals. Rows are top-down with no stride padding —
      // the opposite geometry of BMP, which is what makes a shared
      // position-weighted oracle discriminating.
      val asciiVariant = payload(1) == '3'
      var pos = 2
      def skipWs(): Unit = {
        var done = false
        while (!done && pos < payload.length) {
          val c = payload(pos)
          if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
          else if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
          else done = true
        }
      }
      def readInt(): Long = {
        skipWs()
        var v = 0L; var any = false
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0'); any = true; pos += 1
          if (v > Int.MaxValue) return -1L
        }
        if (any) v else -1L
      }
      val w = readInt(); val h = readInt(); val maxv = readInt()
      val nL = if (w > 0 && h > 0) w * h * 3L else -1L
      // maxval must be 255 for the 1-byte-per-sample raw layout this
      // decoder (and the serializer) implements; 2-byte-maxval PPMs are
      // "needs a real codec" territory → None, like compressed BMP
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
          maxv != 255L || nL > (1L << 26)) None
      else if (asciiVariant) {
        val n = nL.toInt
        val units = new Array[Int](n)
        var i = 0; var ok = true
        while (i < n && ok) {
          val v = readInt()
          if (v < 0 || v > 255) ok = false else { units(i) = v.toInt; i += 1 }
        }
        if (ok && i == n) Some(("ppm", units)) else None
      } else {
        pos += 1 // the single post-maxval whitespace byte mandated by P6
        val n = nL.toInt
        if (pos.toLong + nL > payload.length) None
        else {
          val units = new Array[Int](n)
          var i = 0
          while (i < n) { units(i) = payload(pos + i) & 0xff; i += 1 }
          Some(("ppm", units))
        }
      }
    } else if (tag(0) == "RIFF" && tag(8) == "WAVE") {
      // chunk walk ([[riffChunks]] owns the safety rules); like
      // parseHeader, decode is DEFERRED so data-before-fmt files work
      var pcm16 = false
      var seenFmt = false // latch: only the FIRST valid fmt decides, like parseHeader
      var data = Option.empty[(Int, Long)] // (chunk offset, declared size)
      val it = riffChunks(payload, b)
      while (it.hasNext && (!seenFmt || data.isEmpty)) {
        val (id, off, size) = it.next()
        // declared fmt size < 16 ⇒ the PCM fields would be read from the
        // NEXT chunk's bytes — treat as malformed, same as parseHeader
        if (id == "fmt " && size >= 16 && off + 24 <= payload.length && !seenFmt) {
          // fmt data: audioFormat @+8, bitsPerSample @+22 (both LE)
          seenFmt = true
          pcm16 = u16le(b, off + 8) == 1 && u16le(b, off + 22) == 16
        } else if (id == "data" && data.isEmpty) {
          data = Some((off, size))
        }
      }
      if (!pcm16) None
      else data.map { case (off, size) =>
        val dataOff = off + 8
        val n = (math.min(size, (payload.length - dataOff).toLong) / 2).toInt
        val units = new Array[Int](n)
        var t = 0
        while (t < n) { units(t) = b.getShort(dataOff + 2 * t).toInt; t += 1 }
        ("wav", units)
      }
    } else None
  }

  val ContentSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("n_units", LongType, nullable = true),
    StructField("sum_units", LongType, nullable = true),
    StructField("geom_sum", LongType, nullable = true)))

  /** One decoded payload → its [[ContentSchema]] row: count, plain sum,
    * and the position-weighted Σ value·(k+1) over the units. The weighted
    * sum is what makes geometry bugs visible — a decoder that ignores row
    * padding, reads rows top-down, or flips endianness moves values to
    * different k and mismatches the oracle's first-principles prediction
    * even when the plain sum happens to agree. Shared by the byte-format
    * decode (m03/m04) and the ImageIO decode (m05).
    */
  private[multimodal] def unitAggRow(mediaId: Long,
      decoded: Option[(String, Array[Int])]): Row = {
    val agg = decoded.map { case (fmt, units) =>
      // the weighted sum grows ~|unit|max·n²/2 — a ~50 MB clipped
      // 16-bit WAV (n ≈ 2.4e7) exceeds Long range. Exact arithmetic
      // nulls the overflow instead of wrapping silently negative,
      // matching the i32/avih guards. The plain sum is safe: bounded
      // by 32768·n < 2^63 for any addressable payload.
      var sum = 0L; var geom = 0L; var geomOk = true
      var k = 0
      while (k < units.length) {
        sum += units(k)
        if (geomOk) {
          try geom = Math.addExact(geom,
            Math.multiplyExact(units(k).toLong, (k + 1).toLong))
          catch { case _: ArithmeticException => geomOk = false }
        }
        k += 1
      }
      (fmt, units.length.toLong, sum, if (geomOk) Some(geom) else None)
    }
    Row(mediaId,
      agg.map(_._1).orNull,
      agg.map(a => Long.box(a._2)).orNull,
      agg.map(a => Long.box(a._3)).orNull,
      agg.flatMap(_._4).map(Long.box).orNull)
  }

  /** Batch REAL content decode → per-payload aggregates over the decoded
    * units (one 8-bit channel byte for bmp, one signed 16-bit sample for
    * wav) via [[unitAggRow]].
    */
  def decodeContent(media: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(ContentSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          unitAggRow(r.getAs[Long]("media_id"),
            decodeUnits(r.getAs[Array[Byte]]("payload")))
        }
      }(encoder)
  }

  /** Batch header decode over (media_id, payload) — partition-iterator
    * shape, exactly like [[Multimodal.extractFeatures]].
    */
  def parseHeaders(media: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(ParsedSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val (fmt, w, h, rate, ch, dur) = parseHeader(r.getAs[Array[Byte]]("payload"))
          Row(r.getAs[Long]("media_id"), fmt.orNull,
            w.map(Int.box).orNull, h.map(Int.box).orNull,
            rate.map(Long.box).orNull, ch.map(Int.box).orNull,
            dur.map(Long.box).orNull)
        }
      }(encoder)
  }
}
