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
}
