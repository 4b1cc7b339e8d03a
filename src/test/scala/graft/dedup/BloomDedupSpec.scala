package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-phase Bloom corpus-snapshot dedup: exactness of the final flags,
  * the no-false-negative invariant, fpp behavior of the probe stage, and
  * null handling.
  */
class BloomDedupSpec extends SparkSpec {

  import spark.implicits._

  test("is_dup is exactly corpus membership; bloom never misses a true dup") {
    val corpus = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, null))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha"), (11L, "delta"), (12L, "beta"),
      (13L, null), (14L, "epsilon"))
      .toDF("doc_id", "text")
    val out = Dedup.bloomDedupAgainst(batch, corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    val flags = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_dup")).toMap
    assert(flags == Map(10L -> true, 11L -> false, 12L -> true,
      13L -> false, 14L -> false))
    // no false negatives: every true dup must have bloom_hit set
    out.filter(_.getAs[Boolean]("is_dup"))
      .foreach(r => assert(r.getAs[Boolean]("bloom_hit"),
        s"true dup ${r.getLong(0)} missed by the bloom stage"))
    // null text never probes as a hit
    assert(!out.find(_.getLong(0) == 13L).get.getAs[Boolean]("bloom_hit"))
  }

  test("false-positive sliver stays near fpp and is erased by confirmation") {
    // 2000 corpus texts, 2000 disjoint batch texts → every bloom hit on
    // the batch is a false positive; at fpp=0.01 expect ~20, allow slack
    val corpus = spark.range(2000)
      .select(col("id").as("doc_id"), concat(lit("corpus text "), col("id")).as("text"))
    val batch = spark.range(2000)
      .select((col("id") + 10000).as("doc_id"), concat(lit("novel text "), col("id")).as("text"))
    val out = Dedup.bloomDedupAgainst(batch, corpus, "doc_id", "text").cache()
    try {
      assert(out.where(col("is_dup")).count() == 0L, "disjoint sets cannot have dups")
      val fps = out.where(col("bloom_hit")).count()
      assert(fps <= 200L, s"bloom false positives $fps far above the 1% design point")
    } finally out.unpersist()
  }

  test("filter sizing at 10M digests stays within 1.3x of the analytic optimum") {
    // the bloom_10m bench gate measures wall/no-OOM at this scale; this
    // pins the SIZE claim — an optimally-sized filter needs
    // −n·ln(fpp)/ln²2 bits, and Spark's create() must land within 1.3×
    // of it (a blow-up here means the "~1.2 GB for 10⁹ docs" design
    // arithmetic in Dedup.bloomDedupAgainst no longer holds)
    val n = 10000000L
    val fpp = 0.01
    val df = spark.range(n).select(xxhash64(col("id").cast("string")).as("h"))
    val t0 = System.nanoTime()
    // buildBloom, NOT stat.bloomFilter directly: the raw aggregate clamps
    // to the runtime-join-filter confs (2^26 bits) and would silently
    // hand back an 8 MiB filter with ~5× the design fpp at this n
    val bf = graft.dedup.Dedup.buildBloom(df, "h", n, fpp)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val analyticBits = -n * math.log(fpp) / (math.log(2) * math.log(2))
    info(f"bits=${bf.bitSize()} analytic=$analyticBits%.0f (${bf.bitSize() / 8 / 1024 / 1024} MiB) build=$buildSec%.1fs")
    assert(bf.bitSize() <= 1.3 * analyticBits,
      s"filter ${bf.bitSize()} bits vs analytic $analyticBits — sizing blew past 1.3x")
    assert(bf.bitSize() >= 0.9 * analyticBits,
      "filter suspiciously small — fpp would be above the design point")
  }
}
