package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sampling contracts the d33 oracle can't cover: statistical behavior
  * under a REAL hash (xxhash64 — the oracle runs the mirrorable affine
  * family), determinism across partitionings, the weight-contract edges,
  * and the exactly-k form (transcendental keys, so spec-only).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  /** 20K rows, two groups; weight 9 for ids ≡ 0 mod 2, else 1. */
  private def pool = spark.range(20000).select(
    (col("id") % 2).cast("string").as("grp"),
    col("id").as("doc"),
    when(col("id") % 4 === 0, 9L).otherwise(1L).as("w"),
    (xxhash64(col("id")).bitwiseAND(lit(Long.MaxValue))).as("h"))

  test("bernoulli: inclusion tracks weight — heavy rows sampled ~9x as often") {
    // one group of 10000: 5000 heavy (w=9), 5000 light (w=1), W = 50000;
    // k=500 → p_heavy = 0.09, p_light = 0.01, no saturation
    val one = pool.where(col("grp") === "0")
    val sampled = Sampling.weightedBernoulli(one, "grp", col("h"), "w", k = 500)
      .select("doc", "w").as[(Long, Long)].collect()
    val heavy = sampled.count(_._2 == 9L)
    val light = sampled.count(_._2 == 1L)
    assert(heavy > 350 && heavy < 550, s"heavy count $heavy far from E=450")
    assert(light > 20 && light < 110, s"light count $light far from E=50")
    assert(heavy.toDouble / light > 4.0, s"weight proportionality lost: $heavy/$light")
  }

  test("bernoulli: saturation, zero/negative/null weights, determinism") {
    val rows = Seq((1L, Some(5L)), (2L, Some(0L)), (3L, Some(-4L)), (4L, None),
      (5L, Some(1L))).toDF("doc", "w").withColumn("grp", lit("g"))
      .withColumn("h", xxhash64(col("doc")).bitwiseAND(lit(Long.MaxValue)))
    // k·w ≥ W for every positive weight (k=100, W=6) → both positive-weight
    // rows certain; w ≤ 0 and NULL can never pass the gate
    val got = Sampling.weightedBernoulli(rows, "grp", col("h"), "w", k = 100)
      .select("doc").as[Long].collect().toSet
    assert(got == Set(1L, 5L))
    // identical sample regardless of physical partitioning
    val a = Sampling.weightedBernoulli(pool, "grp", col("h"), "w", 300)
      .select("doc").as[Long].collect().toSet
    val b = Sampling.weightedBernoulli(pool.repartition(13), "grp", col("h"), "w", 300)
      .select("doc").as[Long].collect().toSet
    assert(a == b, "sample must be a pure function of (hash, weights)")
  }

  test("bernoulli: fractional weight columns are rejected, not mis-sampled") {
    // the exact gate truncates in the total (0.6 → 0) but rounds half-up
    // per row (0.6 → 1) — quality scores in (0,1) would yield W=0 and a
    // sample that ignores k entirely, so the double column must throw
    val scored = pool.withColumn("score", col("w") / 10.0)
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedBernoulli(scored, "grp", col("h"), "score", k = 10)
    }
    assert(e.getMessage.contains("integral weight column"))
  }

  test("weightedTopK: exactly k per group, deterministic, weight-biased") {
    val sampled = Sampling.weightedTopK(pool, "grp", col("h"), "w", "doc", k = 200)
    val perGroup = sampled.groupBy("grp").agg(
      count(lit(1)).as("n"), max("rank").as("maxr"), min("rank").as("minr"))
      .as[(String, Long, Int, Int)].collect()
    assert(perGroup.length == 2)
    perGroup.foreach { case (g, n, maxr, minr) =>
      assert(n == 200 && maxr == 200 && minr == 1, s"group $g: n=$n ranks=[$minr,$maxr]")
    }
    // heavy rows (w=9, ids ≡ 0 mod 4) all live in group "0", where they are
    // half the pool: A-ES inclusion ≈ ∝ weight ⇒ heavy share of that
    // group's 200 ≈ 9·5000/(9·5000+5000) = 90% (≈180)
    val heavy = sampled.where(col("w") === 9).count()
    assert(heavy > 150 && heavy <= 200,
      s"$heavy/200 of group-0 samples heavy — expected ≈180 under ∝-weight")
    val again = Sampling.weightedTopK(pool.repartition(7), "grp", col("h"), "w", "doc", 200)
      .select("grp", "doc", "rank").as[(String, Long, Int)].collect().toSet
    val first = sampled.select("grp", "doc", "rank").as[(String, Long, Int)].collect().toSet
    assert(again == first, "exactly-k sample must be partition-invariant")
    // w ≤ 0 rows are excluded even when k exceeds the eligible pool
    val tiny = Seq((1L, 3L), (2L, 0L), (3L, -1L)).toDF("doc", "w")
      .withColumn("grp", lit("g"))
      .withColumn("h", xxhash64(col("doc")).bitwiseAND(lit(Long.MaxValue)))
    val kept = Sampling.weightedTopK(tiny, "grp", col("h"), "w", "doc", 10)
      .select("doc").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("weightedTopKSalted equals the window form on a hot-group pool") {
    // one group holds 95% of the pool — the shape where the plain window
    // serializes; the salted form must return the identical sample
    val rows = spark.range(1, 20001).select(
      when(col("id") % 20 === 0, concat(lit("cold_"), (col("id") % 13).cast("string")))
        .otherwise(lit("hot")).as("grp"),
      col("id").as("doc"),
      (col("id") % 7 + 1).as("w"),
      (xxhash64(col("id")).bitwiseAND(lit(Long.MaxValue))).as("h"))
    val window = Sampling.weightedTopK(rows, "grp", col("h"), "w", "doc", k = 25)
      .select("grp", "doc", "rank").as[(String, Long, Int)].collect().toSet
    val salted = Sampling.weightedTopKSalted(rows, "grp", col("h"), "w", "doc",
        k = 25, factor = 16)
      .select("grp", "doc", "rank").as[(String, Long, Int)].collect().toSet
    assert(salted == window, "salted exactly-k must equal the window form")
    assert(salted.count(_._1 == "hot") == 25)
  }
}
