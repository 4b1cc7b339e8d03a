package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PQ/ADC: exact encode semantics on the fixed codebooks, the argmin tie
  * rule, ADC == dot-with-reconstruction, deterministic training, recall on
  * real embeddings.
  */
class PqAnnSpec extends SparkSpec {

  import spark.implicits._

  private val cb = Similarity.pqFixedCodebooks(dim = 64, numSub = 8, ksub = 4)

  private def codeword(m: Int, j: Int): IndexedSeq[Double] = cb.cb(m)(j)

  test("encode: a vector equal to codeword j encodes as j in every subvector") {
    val v: Seq[Double] = (0 until 8).flatMap(m => codeword(m, 2))
    val codes = Seq(Tuple1(v)).toDF("v")
      .select(Similarity.pqEncode(col("v"), cb).as("c"))
      .head().getSeq[Int](0)
    assert(codes == Seq.fill(8)(2))
  }

  test("encode: exact equidistance ties to the LOWER codeword index") {
    // midpoint of codewords 0 and 1 (eighths — exact binary) is equidistant
    val v: Seq[Double] = (0 until 8).flatMap(m =>
      codeword(m, 0).zip(codeword(m, 1)).map { case (a, b) => (a + b) / 2.0 })
    val codes = Seq(Tuple1(v)).toDF("v")
      .select(Similarity.pqEncode(col("v"), cb).as("c"))
      .head().getSeq[Int](0)
    assert(codes == Seq.fill(8)(0), s"tie must go to the lower index, got $codes")
  }

  test("ADC score equals the dot with the reconstructed (quantized) vector") {
    val corpusVec: Seq[Double] = (0 until 8).flatMap(m => codeword(m, 1))
    val queryVec: Seq[Double] = (0 until 64).map(d => (d % 5) * 0.25 - 0.5)
    val out = Similarity.pqTopKADC(
      Seq((1L, queryVec)).toDF("vec_id", "embedding"),
      Seq((10L, corpusVec)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", cb, k = 1).head()
    // corpusVec IS codeword 1 everywhere → reconstruction is itself →
    // ADC score == exact dot product
    val exact = queryVec.zip(corpusVec).map { case (a, b) => a * b }.sum
    assert(approx(out.getAs[Double]("score"), exact, 1e-12))
    assert(out.getAs[Long]("code_key") ==
      (0 until 8).map(m => 1L * math.pow(4.0, m.toDouble).toLong).sum)
  }

  test("training is deterministic and preserves codeword positions") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val b1 = Similarity.pqTrainCodebooks(e, "vec_id", "embedding", numSub = 8, ksub = 4, iters = 2)
    val b2 = Similarity.pqTrainCodebooks(e, "vec_id", "embedding", numSub = 8, ksub = 4, iters = 2)
    assert(b1 == b2, "two trainings over the same corpus must be identical")
    assert(b1.numSub == 8 && b1.ksub == 4 && b1.ds == 8)
  }

  test("trained PQ recalls exact raw-dot top-k on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.where(col("vec_id") < 10)
    val c = e.where(col("vec_id") >= 10)
    val trained = Similarity.pqTrainCodebooks(c, "vec_id", "embedding",
      numSub = 8, ksub = 16, iters = 3)
    val beam = Similarity.pqTopKADC(q, c, "vec_id", "embedding", trained, k = 20)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approxTop = Similarity.pqTopKADC(q, c, "vec_id", "embedding", trained, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // exact baseline under the SAME metric ADC approximates: raw dot
    val qd = q.select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("qv"))
    val cd = c.select(col("vec_id").as("neighbor_id"), col("embedding").cast("array<double>").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id").asc)
    val exact = qd.crossJoin(cd)
      .withColumn("dot", graft.expr.VectorExprs.dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approxTop).size.toDouble / exact.size
    val beamRecall = (exact intersect beam).size.toDouble / exact.size
    info(s"recall@3=$recall beam(20)-recall=$beamRecall")
    // pure ADC on weak-margin corpora: well above the 3/490 ≈ 0.006 chance
    assert(recall >= 0.06, s"ADC recall $recall below 10× chance")
    // the shortlist DOES hold the true neighbors — what ADC+R harvests
    assert(beamRecall >= 0.5, s"beam recall $beamRecall")
    val reranked = Similarity.pqTopKADCRerank(q, c, "vec_id", "embedding",
      trained, k = 3, shortlist = 20)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rr = (exact intersect reranked).size.toDouble / exact.size
    info(s"rerank(20) recall@3=$rr")
    assert(rr >= 0.5, s"ADC+R recall $rr")
    // exact re-ranking can never do worse than the raw ADC ordering
    assert(rr >= recall)
  }
}
