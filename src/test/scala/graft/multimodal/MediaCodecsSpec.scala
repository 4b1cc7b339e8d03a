package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Container decode: golden-bytes checks for the column-space serializer
  * (vs ByteBuffer-written references), parser roundtrips, and decoder
  * robustness on malformed input.
  */
class MediaCodecsSpec extends SparkSpec {

  import spark.implicits._

  private def planted(kind: String, id: Long, text: String = "body") = {
    val docs = Seq((id, text)).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    MediaCodecs.plantHeaders(Multimodal.deriveMedia(
      docs.select(col("doc_id"), col("text"))))
      .where(col("kind") === kind)
  }

  test("golden bytes: PNG header matches a ByteBuffer-serialized reference") {
    // media_id=3 → kind image (3%3=0); width=(3*37)%1920+1=112, height=(3*53)%1080+1=160
    val payload = planted("image", 3L).select("payload").head().getAs[Array[Byte]](0)
    val ref = new ByteArrayOutputStream()
    ref.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    val ihdr = ByteBuffer.allocate(25).order(ByteOrder.BIG_ENDIAN)
    ihdr.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(112).putInt(160)
      .put(Array[Byte](8, 6, 0, 0, 0)).putInt(0)
    ref.write(ihdr.array())
    ref.write("body".getBytes("UTF-8"))
    assert(payload.toSeq == ref.toByteArray.toSeq)
  }

  test("golden bytes: WAV fmt chunk little-endian fields at spec offsets") {
    // media_id=4 → audio (4%3=1); rate=8000*(1+4%5)=40000, ch=1, dur=(4*97)%600000+1=389
    val payload = planted("audio", 4L).select("payload").head().getAs[Array[Byte]](0)
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    assert(new String(payload, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(payload, 8, 4, "US-ASCII") == "WAVE")
    assert((b.getShort(22) & 0xffff) == 1)       // channels
    assert(b.getInt(24) == 40000)                // sample rate
    assert(b.getInt(28) == 80000)                // byte rate
    assert(b.getInt(40) == 389 * 80000 / 1000)   // data bytes
  }

  test("parse(plant(meta)) roundtrips all three formats") {
    val ids = Seq(3L, 4L, 5L) // image, audio, video
    val docs = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val parsed = MediaCodecs.parseHeaders(
      MediaCodecs.plantHeaders(Multimodal.deriveMedia(docs)))
      .orderBy("media_id").collect()
    val png = parsed(0)
    assert(png.getAs[String]("format") == "png")
    assert(png.getAs[Int]("width") == 112 && png.getAs[Int]("height") == 160)
    val wav = parsed(1)
    assert(wav.getAs[String]("format") == "wav")
    assert(wav.getAs[Long]("sample_rate") == 40000L)
    assert(wav.getAs[Int]("channels") == 1)
    // dur=389 → dataBytes=floor(389*80000/1000)=31120 → parsed 31120*1000/80000=389
    assert(wav.getAs[Long]("duration_ms") == 389L)
    val avi = parsed(2)
    assert(avi.getAs[String]("format") == "avi")
    assert(avi.getAs[Int]("width") == (5 * 37) % 1920 + 1)
    assert(avi.getAs[Int]("height") == (5 * 53) % 1080 + 1)
    // dur=(5*97)%600000+1=486 → frames=floor(486000/33333)=14 → 33333*14/1000=466
    assert(avi.getAs[Long]("duration_ms") == 466L)
  }

  test("BMP pixel decode: values, geometry, padding — against hand arithmetic") {
    // media_id=6 → image (6%3=0); w=1+6%5=2, h=1+6%4=3 → rowBytes=6,
    // rowSize=8 (2 pad bytes). Unit k (image coords) must be (6*7+k)%256.
    val docs = Seq((6L, "x")).toDF("doc_id", "text")
    val media = MediaCodecs.plantContent(Multimodal.deriveMedia(docs))
    val payload = media.select("payload").head().getAs[Array[Byte]](0)
    // raw-byte geometry: bottom-up → image row 0 is the LAST file row
    assert(payload.length == 54 + 3 * 8)
    val topRowStart = 54 + 2 * 8 // file row h-1-0 = 2
    (0 until 6).foreach { j =>
      assert((payload(topRowStart + j) & 0xff) == (6 * 7 + j) % 256,
        s"top image row byte $j")
    }
    // padding bytes are zero
    assert(payload(54 + 6) == 0 && payload(54 + 7) == 0)
    val Some(("bmp", units)) = MediaCodecs.decodeUnits(payload)
    assert(units.length == 2 * 3 * 3)
    units.zipWithIndex.foreach { case (v, k) =>
      assert(v == (6 * 7 + k) % 256, s"unit $k")
    }
  }

  test("PPM decode: P6 raw and P3 ASCII against hand arithmetic") {
    // media_id=6 → image, even → P6; w=1+6%5=2, h=1+6%4=3 → 18 units of
    // (6*11+k)%256. media_id=9 → image, odd → P3; w=1+9%5=5, h=1+9%4=2.
    for ((id, expFmt) <- Seq((6L, "P6"), (9L, "P3"))) {
      val docs = Seq((id, "x")).toDF("doc_id", "text")
      val media = MediaCodecs.plantPpm(Multimodal.deriveMedia(docs))
      val payload = media.select("payload").head().getAs[Array[Byte]](0)
      assert(new String(payload, 0, 2, "US-ASCII") == expFmt)
      assert(new String(payload, "US-ASCII").contains("# planted"),
        "comment line missing from planted header")
      val Some(("ppm", units)) = MediaCodecs.decodeUnits(payload)
      val w = 1 + id % 5; val h = 1 + id % 4
      assert(units.length == (w * h * 3).toInt)
      units.zipWithIndex.foreach { case (v, k) =>
        assert(v == ((id * 11 + k) % 256).toInt, s"id=$id unit $k")
      }
    }
  }

  test("malformed PPM never decodes: truncation, bad maxval, bad ASCII sample") {
    def ppm(id: Long): Array[Byte] = {
      val docs = Seq((id, "x")).toDF("doc_id", "text")
      MediaCodecs.plantPpm(Multimodal.deriveMedia(docs))
        .select("payload").head().getAs[Array[Byte]](0)
    }
    val p6 = ppm(6L)
    assert(MediaCodecs.decodeUnits(p6.dropRight(1)).isEmpty, "truncated P6 decoded")
    // maxval 255 → 254: 2-byte/sample territory isn't implemented → None
    val s6 = new String(p6, "ISO-8859-1").replaceFirst("255", "254")
    assert(MediaCodecs.decodeUnits(s6.getBytes("ISO-8859-1")).isEmpty, "bad maxval decoded")
    val p3 = ppm(9L)
    // an out-of-range ASCII sample (>255) is malformed, not truncated mod 256
    val s3 = new String(p3, "US-ASCII")
    val firstBody = s3.indexOf("255\n") + 4
    val broken = s3.substring(0, firstBody) + "999 " + s3.substring(firstBody)
    assert(MediaCodecs.decodeUnits(broken.getBytes("US-ASCII")).isEmpty,
      "out-of-range ASCII sample decoded")
    // P with a non-digit-separator third byte is NOT ppm (e.g. 'PK..' zip)
    assert(MediaCodecs.decodeUnits("P6x 2 2 255 xxxxxxxxxxxx".getBytes("US-ASCII")).isEmpty)
  }

  test("WAV PCM decode: signed LE samples against hand arithmetic") {
    // media_id=4 → audio; n = 40 + 4%17 = 44; s_t = (4*31 + 17t) % 4096 - 2048
    val docs = Seq((4L, "x")).toDF("doc_id", "text")
    val media = MediaCodecs.plantContent(Multimodal.deriveMedia(docs))
    val payload = media.select("payload").head().getAs[Array[Byte]](0)
    val Some(("wav", units)) = MediaCodecs.decodeUnits(payload)
    assert(units.length == 44)
    units.zipWithIndex.foreach { case (s, t) =>
      assert(s == (4 * 31 + 17 * t) % 4096 - 2048, s"sample $t")
    }
    assert(units.exists(_ < 0), "plant must cover the signed range")
  }

  test("decodeContent aggregates match brute-force over decodeUnits") {
    val docs = (0L to 11L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = MediaCodecs.plantContent(Multimodal.deriveMedia(docs))
      .where(col("kind") =!= "video")
    val rows = MediaCodecs.decodeContent(media).orderBy("media_id").collect()
    val payloads = media.select("media_id", "payload").orderBy("media_id").collect()
    assert(rows.length == 8) // 12 ids minus 4 video
    rows.zip(payloads).foreach { case (r, p) =>
      val Some((fmt, units)) = MediaCodecs.decodeUnits(p.getAs[Array[Byte]]("payload"))
      assert(r.getAs[String]("format") == fmt)
      assert(r.getAs[Long]("n_units") == units.length.toLong)
      assert(r.getAs[Long]("sum_units") == units.map(_.toLong).sum)
      assert(r.getAs[Long]("geom_sum") ==
        units.zipWithIndex.map { case (v, k) => v.toLong * (k + 1) }.sum)
    }
  }

  test("decodeFeatures: real histograms for bmp/wav, stub fallback otherwise") {
    val docs = Seq((6L, "img"), (4L, "aud")).toDF("doc_id", "text")
    val media = MediaCodecs.plantContent(Multimodal.deriveMedia(docs))
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val Some(("bmp", px)) = MediaCodecs.decodeUnits(media(6L))
    val fImg = Multimodal.decodeFeatures(media(6L))
    assert(math.abs(fImg.sum - 1f) < 1e-5)
    (0 until 16).foreach { bin =>
      assert(fImg(bin) == px.count(_ >> 4 == bin).toFloat / px.length, s"bin $bin")
    }
    val Some(("wav", sm)) = MediaCodecs.decodeUnits(media(4L))
    val fAud = Multimodal.decodeFeatures(media(4L))
    (0 until 16).foreach { bin =>
      assert(fAud(bin) == sm.count(s => (s + 32768) >> 12 == bin).toFloat / sm.length)
    }
    // non-decodable bytes take the stub path
    val junk = "no magic here".getBytes("UTF-8")
    assert(Multimodal.decodeFeatures(junk).toSeq == Multimodal.decodeStub(junk).toSeq)
  }

  test("malformed input never throws: nulls for garbage/truncated/missing") {
    val cases = Seq[(Long, Array[Byte])](
      (1L, null),
      (2L, Array[Byte]()),
      (3L, "just some text, no magic".getBytes("UTF-8")),
      (4L, Array[Byte](0x89.toByte, 'P', 'N', 'G')), // truncated magic
      // RIFF/WAVE with a hostile 0xFFFFFFFF chunk size (int-overflow bait)
      (5L, "RIFF\u0000\u0000\u0000\u0000WAVEjunkÿÿÿÿ".getBytes("ISO-8859-1")))
    val df = cases.toDF("media_id", "payload")
    val out = MediaCodecs.parseHeaders(df).orderBy("media_id").collect()
    assert(out.length == 5)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("format"))))
    // the content decoder is equally unshockable, including a BMP whose
    // header promises more pixel rows than the payload carries
    val truncatedBmp = {
      val full = MediaCodecs.plantContent(Multimodal.deriveMedia(
        Seq((6L, "x")).toDF("doc_id", "text")))
        .select("payload").head().getAs[Array[Byte]](0)
      full.take(full.length - 3)
    }
    (cases.map(_._2) :+ truncatedBmp).foreach { p =>
      assert(MediaCodecs.decodeUnits(p).isEmpty)
    }
  }

  test("u32 fields above Int.MaxValue become nulls, not negative truncations") {
    // PNG declaring width 0x80000000: a crafted dimension must not surface
    // as -2147483648 in an Int column
    val png = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    png.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
      .putInt(13).put("IHDR".getBytes("US-ASCII"))
      .putInt(0x80000000).putInt(10).put(Array[Byte](8, 6, 0, 0, 0))
    val (fmt, w, h, _, _, _) = MediaCodecs.parseHeader(png.array())
    assert(fmt.contains("png") && w.isEmpty && h.contains(10))

    // AVI with uspf = frames = 0xFFFFFFFF: the u32×u32 product exceeds
    // Long.MaxValue — duration must be null, not a wrapped negative
    val avi = ByteBuffer.allocate(72).order(ByteOrder.LITTLE_ENDIAN)
    avi.put("RIFF".getBytes("US-ASCII")).putInt(64)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(68)
      .put("hdrl".getBytes("US-ASCII"))
      .put("avih".getBytes("US-ASCII")).putInt(56)
    avi.putInt(32, 0xFFFFFFFF) // µs/frame
    avi.putInt(48, 0xFFFFFFFF) // total frames
    avi.putInt(64, 640).putInt(68, 480)
    val (fmt2, w2, h2, _, _, dur) = MediaCodecs.parseHeader(avi.array())
    assert(fmt2.contains("avi") && w2.contains(640) && h2.contains(480))
    assert(dur.isEmpty, s"overflowing duration must be null, got $dur")
  }

  // raw RIFF/WAVE builders for the robustness cases below
  private def leBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
  private def riffChunkBytes(tag: String, body: Array[Byte]): Array[Byte] =
    tag.getBytes("US-ASCII") ++ leBytes(body.length.toLong, 4) ++ body ++
      (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
  private def fmtBody(rate: Long, ch: Int): Array[Byte] =
    leBytes(1, 2) ++ leBytes(ch.toLong, 2) ++ leBytes(rate, 4) ++
      leBytes(rate * ch * 2, 4) ++ leBytes(ch.toLong * 2, 2) ++ leBytes(16, 2)
  private def wave(chunks: Array[Byte]*): Array[Byte] = {
    val body = chunks.flatten.toArray
    "RIFF".getBytes("US-ASCII") ++ leBytes(body.length + 4L, 4) ++
      "WAVE".getBytes("US-ASCII") ++ body
  }

  test("truncated fmt chunk is malformed, not parsed from the next chunk's bytes") {
    // declared fmt size 0: the PCM fields are NOT present — the unguarded
    // walk read channels from the letters "ta" of the following "data" tag
    val payload = wave(
      riffChunkBytes("fmt ", Array.emptyByteArray),
      riffChunkBytes("data", leBytes(0x0201, 2) ++ leBytes(0x0403, 2)))
    val (fmt, _, _, rate, ch, _) = MediaCodecs.parseHeader(payload)
    assert(fmt.isEmpty && rate.isEmpty && ch.isEmpty,
      s"truncated fmt must be malformed, got $fmt $rate $ch")
    assert(MediaCodecs.decodeUnits(payload).isEmpty)
  }

  test("data chunk before fmt: spec-legal file keeps duration and decodes") {
    // 4 samples = 8 data bytes at 8000 Hz mono 16-bit (byteRate 16000)
    val samples = Array.tabulate(4)(t => leBytes((t * 3).toLong & 0xffffL, 2)).flatten
    val payload = wave(
      riffChunkBytes("data", samples),
      riffChunkBytes("fmt ", fmtBody(8000, 1)))
    val (fmt, _, _, rate, ch, dur) = MediaCodecs.parseHeader(payload)
    assert(fmt.contains("wav") && rate.contains(8000L) && ch.contains(1))
    assert(dur.contains(samples.length * 1000L / 16000L),
      s"data-before-fmt must still yield a duration, got $dur")
    val decoded = MediaCodecs.decodeUnits(payload)
    assert(decoded.exists(_._1 == "wav"), "data-before-fmt must still decode")
    assert(decoded.get._2.toSeq == Seq(0, 3, 6, 9))
  }

  test("multi-fmt file: first valid fmt decides for BOTH header and content") {
    // fmt(non-PCM float32) then fmt(PCM16): without the first-fmt latch,
    // decodeUnits took the second chunk (decodable) while parseHeader took
    // the first (not PCM16 — but it still reports wav meta), letting the
    // two consumers of one payload disagree. Both must latch chunk 1.
    val floatFmt = leBytes(3, 2) ++ leBytes(1, 2) ++ leBytes(8000, 4) ++
      leBytes(32000, 4) ++ leBytes(4, 2) ++ leBytes(32, 2) // IEEE float, 32-bit
    val samples = Array.tabulate(4)(t => leBytes((t * 3).toLong & 0xffffL, 2)).flatten
    val payload = wave(
      riffChunkBytes("fmt ", floatFmt),
      riffChunkBytes("fmt ", fmtBody(8000, 1)),
      riffChunkBytes("data", samples))
    val (fmt, _, _, rate, _, _) = MediaCodecs.parseHeader(payload)
    assert(fmt.contains("wav") && rate.contains(8000L)) // header: first fmt
    assert(MediaCodecs.decodeUnits(payload).isEmpty,
      "content decode must honor the FIRST fmt (non-PCM) like the header does")
  }

  test("serializers refuse out-of-range field values instead of truncating") {
    // lpad TRUNCATES over-long hex: a negative or >= 2^32 value would emit a
    // structurally valid but numerically wrong header with no error
    val bad = Seq(1L).toDF("x")
      .select(MediaCodecs.wavHeader(lit(8000L), lit(1L), lit(-5L)).as("h"))
    val e = intercept[Exception] { bad.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("out of range")),
      s"expected a range error, got $e")
  }
}
