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
    val feats = Multimodal.extractFeatures(spark, Multimodal.deriveMedia(docs))
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
}
