package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("cosine: orthogonal → 0, identical → 1, opposite → -1") {
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(1.0, 2.0), Array(1.0, 2.0), 1.0),
      (Array(1.0, 0.0), Array(-1.0, 0.0), -1.0))
      .toDF("a", "b", "expected")
    val rows = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("expected"))
      .collect()
    rows.foreach(r => assert(approx(r.getDouble(0), r.getDouble(1), 1e-12)))
  }

  test("brute-force top-k: exact self-match first, ranks by cosine") {
    val corpus = Seq(
      (10L, vec(1, 0, 0, 0)), (11L, vec(0.9, 0.1, 0, 0)),
      (12L, vec(0, 1, 0, 0)), (13L, vec(-1, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, vec(1, 0, 0, 0))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(10L, 11L, 12L))
    assert(approx(top(0).getAs[Double]("cosine"), 1.0, 1e-9))
  }

  test("LSH top-k recalls most exact neighbors on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val c = e.where(col("vec_id") >= 5)
    val exact = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approxTop = Similarity.lshTopK(q, c, "vec_id", "embedding", 64, bits = 6, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approxTop).size.toDouble / exact.size
    // 6-bit multi-probe over 500 vectors: expect well above chance
    assert(recall >= 0.25, s"recall $recall")
    // approximate cosines are true cosines (no estimation error in ranking stage)
    val approxRows = Similarity.lshTopK(q, c, "vec_id", "embedding", 64, bits = 6, k = 3)
    assert(approxRows.where(col("cosine") > 1.0001 || col("cosine") < -1.0001).count() == 0)
  }

  test("hyperplane signature is deterministic and splits the space") {
    val df = Seq((1L, vec(1, 0, 0, 0)), (2L, vec(1, 0.01, 0, 0)), (3L, vec(-1, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val sigs = df.select(col("vec_id"),
      Similarity.hyperplaneSignature(col("embedding").cast("array<double>"), 4, 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L)) // nearly identical vectors share a bucket
    assert(sigs(1L) != sigs(3L)) // antipodal vectors do not
  }
}
