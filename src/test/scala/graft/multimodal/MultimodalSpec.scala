package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world of binary payloads"),
    (2L, "another document with different bytes"),
    (3L, "hello world of binary payloads")) // same text as 1
    .toDF("doc_id", "text")

  test("deriveMedia: stable kinds, payload round-trips the text, typed metadata") {
    val media = Multimodal.deriveMedia(docs)
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "kind", "payload", "meta"))
    val rows = media.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(new String(rows(1L).getAs[Array[Byte]]("payload"), "UTF-8")
      == "hello world of binary payloads")
    assert(Set("image", "audio", "video").contains(rows(2L).getAs[String]("kind")))
    val meta = rows(1L).getStruct(rows(1L).fieldIndex("meta"))
    assert(meta.getAs[Int]("width") >= 1 && meta.getAs[Int]("width") <= 1920)
  }

  test("extractFeatures: deterministic, L1-normalized, equal payloads → equal features") {
    val feats = Multimodal.extractFeatures(Multimodal.deriveMedia(docs))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](2)).toMap
    assert(feats(1L).length == Multimodal.FeatureDim)
    assert(approx(feats(1L).map(_.toDouble).sum, 1.0, 1e-5))
    assert(feats(1L) == feats(3L))
    assert(feats(1L) != feats(2L))
  }

  test("frameSample: n evenly spaced single-byte frames") {
    val sampled = Multimodal.frameSample(Multimodal.deriveMedia(docs), 4)
      .where(col("media_id") === 1).head().getSeq[Array[Byte]](1)
    assert(sampled.length == 4)
    assert(sampled.forall(_.length == 1))
  }

  test("resizeMeta: aspect-preserving, never upscales") {
    val out = Multimodal.resizeMeta(Multimodal.deriveMedia(docs), maxEdge = 256)
      .collect()
    out.foreach { r =>
      assert(r.getAs[Int]("new_width") <= math.max(256, 1920))
      assert(r.getAs[Int]("new_width") >= 1)
      assert(math.max(r.getAs[Int]("new_width"), r.getAs[Int]("new_height")) <= 1920)
    }
  }

  test("resizeMeta: extreme aspect ratio floors the short edge at 1 px") {
    // 1×1000 at maxEdge 100: scale 0.1 would round the short edge to 0
    val skinny = Seq((1L, 1, 1000)).toDF("media_id", "w", "h")
      .select(col("media_id"),
        struct(lit(null).cast("string").as("mime"), col("w").as("width"),
          col("h").as("height"), lit(null).cast("long").as("duration_ms")).as("meta"))
    val r = Multimodal.resizeMeta(skinny, maxEdge = 100).head()
    assert(r.getAs[Int]("new_width") == 1, "short edge must clamp to 1, not 0")
    assert(r.getAs[Int]("new_height") == 100)
  }

  test("resizeMeta: missing or non-positive dims → NULL, never a fabricated edge") {
    // greatest() SKIPS nulls, so the unguarded form turned (null, 500) into
    // a confident 1-px width and 0×0 into 1×1
    val rows = Seq(
      (1L, Option(800), Option(500)),
      (2L, Option.empty[Int], Option(500)),
      (3L, Option(0), Option(0)))
      .toDF("media_id", "w", "h")
      .select(col("media_id"),
        struct(lit(null).cast("string").as("mime"), col("w").as("width"),
          col("h").as("height"), lit(null).cast("long").as("duration_ms")).as("meta"))
    val out = Multimodal.resizeMeta(rows, maxEdge = 100).orderBy("media_id").collect()
    assert(out(0).getAs[Int]("new_width") == 100 && out(0).getAs[Int]("new_height") == 63)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2),
      "a missing dimension must propagate as NULL")
    assert(out(2).isNullAt(1) && out(2).isNullAt(2),
      "zero dimensions are corrupt metadata, not a 1×1 image")
  }

  test("frameSample refuses n = 0 at plan construction") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.frameSample(Multimodal.deriveMedia(docs), 0)
    }
    assert(e.getMessage.contains("frame count"))
  }
}
