package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {

  import spark.implicits._

  private val oneHot: Array[(Int, Seq[Double])] = Array(
    0 -> Seq(1.0, 0.0, 0.0, 0.0),
    1 -> Seq(0.0, 1.0, 0.0, 0.0))

  private def run(rows: Seq[(Long, Seq[Double])], tau: Double,
                  cap: Option[Int] = None) =
    Similarity.semanticDedupWithCentroids(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding", oneHot, tau, cap)
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.get(r.fieldIndex("cell"))).map(_.asInstanceOf[Int]),
          r.getAs[Boolean]("cell_capped"), r.getAs[Boolean]("kept"))).toMap

  test("keep rule: lowest id survives, near-dup drops, dissimilar cellmate stays") {
    val out = run(Seq(
      1L -> Seq(1.0, 0.0, 0.0, 0.0),   // cell 0, first — kept
      2L -> Seq(0.9, 0.1, 0.0, 0.0),   // cos(1,2)=0.9939 ≥ τ → dropped
      3L -> Seq(0.5, 0.5, 0.5, 0.5),   // cell tie → cell 0; cos ≤ 0.56 → kept
      4L -> Seq(0.0, 1.0, 0.0, 0.0)),  // alone in cell 1 — kept
      tau = 0.9)
    assert(out(1L) == (Some(0), false, true))
    assert(out(2L) == (Some(0), false, false))
    assert(out(3L) == (Some(0), false, true), "tie must break to the LOWEST cell")
    assert(out(4L) == (Some(1), false, true))
  }

  test("chain a~b~c with a≁c: b and c BOTH drop (independent rule, not CC)") {
    val out = run(Seq(
      4L -> Seq(0.0, 1.0, 0.0, 0.0),
      5L -> Seq(0.0, 1.0, 0.35, 0.0),  // cos(4,5)=0.9438 ≥ τ
      6L -> Seq(0.0, 1.0, 0.7, 0.0)),  // cos(5,6)=0.9627 ≥ τ; cos(4,6)=0.8192 < τ
      tau = 0.9)
    assert(out(4L)._3 && !out(5L)._3 && !out(6L)._3,
      "c must drop against b even though b itself dropped")
  }

  test("cells bound comparisons: near-dups in DIFFERENT cells both survive") {
    val out = run(Seq(
      1L -> Seq(0.6, 0.55, 0.0, 0.0),  // cell 0
      2L -> Seq(0.55, 0.6, 0.0, 0.0)), // cell 1, cosine 0.998 — never compared
      tau = 0.9)
    assert(out(1L)._3 && out(2L)._3)
  }

  test("maxCellSize: degenerate cell skips pairwise, keeps + flags; others dedup") {
    val hot = (10L to 14L).map(i => i -> Seq(1.0, 0.0, 0.0, 0.0)) // 5 identical, cell 0
    val pair = Seq(
      20L -> Seq(0.0, 1.0, 0.0, 0.0),
      21L -> Seq(0.0, 0.98, 0.1, 0.0)) // cell 1, cos 0.9949 → dropped
    val out = run(hot ++ pair, tau = 0.9, cap = Some(3))
    hot.foreach { case (id, _) =>
      assert(out(id) == (Some(0), true, true), s"capped cell row $id") }
    assert(out(20L) == (Some(1), false, true))
    assert(out(21L) == (Some(1), false, false), "uncapped cell must still dedup")
  }

  test("null and zero-norm vectors: null cell, kept") {
    val df = Seq(1L -> Seq(0.0, 0.0, 0.0, 0.0)).toDF("vec_id", "embedding")
      .union(spark.sql("SELECT 2L, CAST(NULL AS ARRAY<DOUBLE>)"))
    val out = Similarity.semanticDedupWithCentroids(
      df, "vec_id", "embedding", oneHot, tau = 0.9)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.isNullAt(r.fieldIndex("cell")), r.getAs[Boolean]("kept"))).toMap
    assert(out(1L) == (true, true) && out(2L) == (true, true))
  }

  test("trained path: covers every row, deterministic run-to-run") {
    val corpus = (0L until 60L).map(i =>
      i -> Seq.tabulate(4)(d => math.sin(i * 0.7 + d).abs + 0.01))
      .toDF("vec_id", "embedding")
    def result() = Similarity.semanticDedup(
      corpus, "vec_id", "embedding", nlist = 4, tau = 0.999)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("kept"))).toSeq
    val r1 = result()
    assert(r1.length == 60, "one verdict per corpus row")
    assert(r1 == result(), "sampled-kmeans training must be reproducible")
  }
}
