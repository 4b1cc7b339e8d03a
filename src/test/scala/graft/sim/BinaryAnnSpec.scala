package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binary (1-bit) sign-code ANN: exact pack semantics, Hamming ranking,
  * and a beats-chance recall floor on real embeddings.
  */
class BinaryAnnSpec extends SparkSpec {

  import spark.implicits._

  test("signCode63 packs bit j-1 = v[j] > 0, dim 64 unused, ANSI-safe top bit") {
    // positive at 1-based dims 1, 3, 63 → bits 0, 2, 62
    val v: Seq[Double] = (1 to 64).map {
      case 1 | 3 | 63 => 1.0
      case 64 => 5.0 // dim 64 must NOT contribute
      case _ => -1.0
    }
    val code = Seq(Tuple1(v)).toDF("v")
      .select(Similarity.signCode63(col("v")).as("c")).head().getLong(0)
    assert(code == ((1L << 0) | (1L << 2) | (1L << 62)))
    // all-positive: 63 set bits, still a positive long (no sign-bit use)
    val all = Seq(Tuple1((1 to 64).map(_ => 1.0): Seq[Double])).toDF("v")
      .select(Similarity.signCode63(col("v")).as("c")).head().getLong(0)
    assert(all == (1L << 63) - 1 && all > 0)
  }

  test("binaryTopK: identical vector ranks first at hamming 0, ties to lower id") {
    val base: Seq[Double] = (1 to 64).map(d => if (d % 3 == 0) 1.0 else -1.0)
    val flipped = base.updated(0, 1.0) // one sign flip → hamming 1
    val corpus = Seq((10L, base), (11L, base), (12L, flipped))
      .toDF("vec_id", "embedding")
    val q = Seq((1L, base)).toDF("vec_id", "embedding")
    val rows = Similarity.binaryTopK(q, corpus, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(rows.map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("hamming"))).toSeq
      == Seq((10L, 0), (11L, 0), (12L, 1)))
  }

  test("sign-code recall beats chance on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.where(col("vec_id") < 10)
    val c = e.where(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val binary = Similarity.binaryTopK(q, c, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect binary).size.toDouble / exact.size
    info(s"1-bit recall@3=$recall")
    // chance is 3/490 ≈ 0.006; 63 sign bits of angular information must
    // do far better even on weak-margin corpora
    assert(recall >= 0.05, s"recall $recall")
  }
}
