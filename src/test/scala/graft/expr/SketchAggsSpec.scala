package graft.expr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-Min / register-sketch aggregate contracts the d28/d29 oracles
  * can't cover: merge correctness across arbitrary partitionings (the
  * map-side-combine path), the never-undercount guarantee, accuracy at
  * realistic cardinality with a REAL hash (xxhash64 — the oracle twins
  * run the SQL-mirrorable family instead), and the input contract errors.
  */
class SketchAggsSpec extends SparkSpec {
  import SketchAggs._

  /** 200K rows over 10K distinct keys, zipf-ish skew via id*id mod: key
    * frequency ranges from ~1 to ~hundreds; hashed with xxhash64 masked
    * non-negative (top bit cleared — the aggregates' contract).
    */
  private def corpus(parts: Int): DataFrame =
    spark.range(200000).repartition(parts)
      .select((col("id") % 10000).as("key"))
      .select(col("key"),
        (xxhash64(col("key")).bitwiseAND(lit(Long.MaxValue))).as("h"))

  test("cms: estimate never undercounts, and is exact when width clears the domain") {
    val df = corpus(8)
    val sketch = df.agg(cmsSketch(col("h"), 4, 1 << 16).as("cms"))
    val joined = df.groupBy("key", "h").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .select(col("exact"), cmsEstimate(col("cms"), col("h"), 4, 1 << 16).as("est"))
    val rows = joined.select(
      sum(when(col("est") < col("exact"), 1).otherwise(0)).as("under"),
      sum(when(col("est") > col("exact"), 1).otherwise(0)).as("over"),
      count(lit(1)).as("n")).head()
    assert(rows.getLong(0) == 0, "CMS must never undercount")
    // width 65536 >> 10K keys: min-over-4-rows collisions should be rare.
    // The affine rows share one reduced hash (that's what makes them
    // SQL-mirrorable), so they are correlated rather than pairwise
    // independent — measured all-4-row collision rate here is ~1.3%, not
    // the independent-family ~0.04%; the bound pins it stays in that band.
    assert(rows.getLong(1) < rows.getLong(2) / 50,
      s"width>>domain should make estimates exact almost everywhere, ${rows.getLong(1)} over of ${rows.getLong(2)}")
  }

  test("cms: partial-merge parity — 1 vs 13 partitions build the identical sketch") {
    val a = corpus(1).agg(cmsSketch(col("h"), 4, 512).as("cms")).head().getSeq[Long](0)
    val b = corpus(13).agg(cmsSketch(col("h"), 4, 512).as("cms")).head().getSeq[Long](0)
    assert(a == b)
    // total mass: every row increments exactly one counter per sketch row
    assert(a.sum == 200000L * 4)
  }

  test("cms: grouped sketches carry fixed state and sum to the global sketch") {
    val df = corpus(8).withColumn("g", col("key") % 4)
    val grouped = df.groupBy("g").agg(cmsSketch(col("h"), 2, 64).as("cms"))
      .collect().map(_.getSeq[Long](1))
    val global = df.agg(cmsSketch(col("h"), 2, 64).as("cms")).head().getSeq[Long](0)
    val summed = grouped.reduce((x, y) => x.zip(y).map { case (p, q) => p + q })
    assert(summed == global, "group sketches must merge to the global sketch")
  }

  test("cms: nulls are skipped, negative hashes throw") {
    import spark.implicits._
    val withNull = Seq[java.lang.Long](3L, null, 5L).toDF("h")
    val s = withNull.agg(cmsSketch(col("h"), 2, 16).as("cms")).head().getSeq[Long](0)
    assert(s.sum == 2L * 2) // two non-null rows x depth 2
    val neg = intercept[Exception] {
      Seq(-1L).toDF("h").agg(cmsSketch(col("h"), 2, 16)).collect()
    }
    assert(neg.getMessage != null)
  }

  test("cms: analysis-time rejection of bad depth/width") {
    import spark.implicits._
    val df = Seq(1L).toDF("h")
    intercept[Exception] { df.agg(cmsSketch(col("h"), 0, 16)).collect() }
    intercept[Exception] { df.agg(cmsSketch(col("h"), 1024, 1 << 16)).collect() }
  }

  test("hll: register parity across partitionings and merge-is-max") {
    val a = corpus(1).agg(registerSketch(col("h"), 256).as("r")).head().getSeq[Int](0)
    val b = corpus(17).agg(registerSketch(col("h"), 256).as("r")).head().getSeq[Int](0)
    assert(a == b)
    assert(a.length == 256 && a.forall(r => r >= 0 && r <= MaxRank))
  }

  test("hll: raw estimate within 15% at 10K distinct under xxhash64 (m=256)") {
    // deterministic corpus + deterministic hash => a fixed estimate; the
    // 15% bound is ~2.5 sigma for m=256 (1.04/sqrt(256) = 6.5% std err)
    val regs = corpus(8).agg(registerSketch(col("h"), 256).as("r"))
    val est = regs.select(posexplode(col("r")).as(Seq("i", "rank")))
      .agg(sum(pow(lit(2.0), lit(MaxRank) - col("rank")).cast("decimal(38,0)")).as("s"))
      .select((lit(hllNumerator(256)) / col("s").cast("double")).as("est"))
      .head().getDouble(0)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.15, s"raw HLL estimate $est vs 10000")
  }

  test("hll: distinct-only dependence — duplicating every row leaves registers unchanged") {
    val once = corpus(4)
    val twice = once.union(once).union(once)
    val a = once.agg(registerSketch(col("h"), 64).as("r")).head().getSeq[Int](0)
    val b = twice.agg(registerSketch(col("h"), 64).as("r")).head().getSeq[Int](0)
    assert(a == b)
  }

  test("hll: m must be a power of two; negative hash throws") {
    import spark.implicits._
    val df = Seq(1L).toDF("h")
    intercept[Exception] { df.agg(registerSketch(col("h"), 48)).collect() }
    intercept[Exception] {
      Seq(-7L).toDF("h").agg(registerSketch(col("h"), 64)).collect()
    }
  }

  test("hll: rank arithmetic matches the SQL spelling on edge hashes") {
    // h < m (w=0, the empty-quotient sentinel), h = m (w=1, rank 1),
    // powers of two up the ladder, and Long.MaxValue
    val m = 64
    for (h <- Seq(0L, 5L, 63L, 64L, 128L, 1L << 40, Long.MaxValue)) {
      val w = h / m
      val viaBits =
        math.min(java.lang.Long.bitCount((w & -w) - 1) + 1, MaxRank)
      assert(hllRank(h, m) == viaBits, s"h=$h")
    }
  }

  test("merge aggregates: two-level (daily -> total) equals direct over the raw stream") {
    val df = corpus(8).withColumn("day", col("key") % 7)
    val daily = df.groupBy("day").agg(
      cmsSketch(col("h"), 4, 512).as("cms"), registerSketch(col("h"), 64).as("regs"))
    val merged = daily.agg(
      cmsMerge(col("cms")).as("cms"), registerMerge(col("regs")).as("regs")).head()
    val direct = corpus(8).agg(
      cmsSketch(col("h"), 4, 512).as("cms"), registerSketch(col("h"), 64).as("regs")).head()
    assert(merged.getSeq[Long](0) == direct.getSeq[Long](0),
      "cms_merge(daily) must equal the direct sketch exactly")
    assert(merged.getSeq[Int](1) == direct.getSeq[Int](1),
      "register_merge(daily) must equal the direct sketch exactly")
  }

  test("merge aggregates: length mismatch throws, nulls skipped, empty group is empty") {
    import spark.implicits._
    val mismatched = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("cms")
    intercept[Exception] { mismatched.agg(cmsMerge(col("cms"))).collect() }
    val withNull = Seq(Some(Seq(1L, 2L)), None, Some(Seq(10L, 20L))).toDF("cms")
    assert(withNull.agg(cmsMerge(col("cms"))).head().getSeq[Long](0) == Seq(11L, 22L))
    val empty = Seq.empty[Seq[Long]].toDF("cms")
    assert(empty.agg(cmsMerge(col("cms"))).head().getSeq[Long](0).isEmpty)
    val regsNull = Seq(Some(Seq(3, 1)), None, Some(Seq(2, 5))).toDF("regs")
    assert(regsNull.agg(registerMerge(col("regs"))).head().getSeq[Int](0) == Seq(3, 5))
  }

  test("histogram: exact bucketing incl. underflow, overflow, NaN, null, hi-edge") {
    import spark.implicits._
    // [0, 100) in 4 bins of 25; -5 underflows, 100 and 250 overflow
    // (v >= hi), NaN and null are skipped entirely
    val vals = Seq(Some(-5.0), Some(0.0), Some(24.999), Some(25.0), Some(49.0),
      Some(75.0), Some(99.999), Some(100.0), Some(250.0),
      Some(Double.NaN), None)
    val got = vals.toDF("v").agg(histSketch(col("v"), 0.0, 100.0, 4).as("h"))
      .head().getSeq[Long](0)
    assert(got == Seq(1L, 2L, 2L, 0L, 2L, 2L),
      s"bucket layout drifted: $got")
  }

  test("histogram: interpolated quantiles match hand arithmetic; empty is null") {
    import spark.implicits._
    // 10 in-range values in [0, 10): bins of width 1, one value per bin →
    // quantile q lands at rank ceil(10q); P50 → rank 5 → bin 5 →
    // 4 + (5-4)/1 = 5.0; P99 → rank 10 → bin 10 → 9 + 1/1 = 10.0
    val df = (0 until 10).map(_ + 0.5).toDF("v")
      .agg(histSketch(col("v"), 0.0, 10.0, 10).as("h"))
    val r = df.select(
      histQuantile(col("h"), 0.5, 0.0, 10.0, 10).as("p50"),
      histQuantile(col("h"), 0.99, 0.0, 10.0, 10).as("p99"),
      histTotal(col("h"), 10).as("n")).head()
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 10.0 && r.getLong(2) == 10L)
    // all-overflow histogram: in-range mass 0 → quantile is NULL, not 0/0
    val empty = Seq(500.0, 600.0).toDF("v")
      .agg(histSketch(col("v"), 0.0, 10.0, 10).as("h"))
      .select(histQuantile(col("h"), 0.5, 0.0, 10.0, 10).as("p50")).head()
    assert(empty.isNullAt(0))
  }

  test("histogram: daily arrays merged via cms_merge equal the direct histogram") {
    val df = corpus(8).withColumn("day", col("key") % 7)
      .withColumn("v", (col("h") % 1000L).cast("double"))
    val merged = df.groupBy("day").agg(histSketch(col("v"), 0.0, 1000.0, 20).as("h"))
      .agg(cmsMerge(col("h"))).head().getSeq[Long](0)
    val direct = df.agg(histSketch(col("v"), 0.0, 1000.0, 20)).head().getSeq[Long](0)
    assert(merged == direct, "histogram arrays are additive — merge must be exact")
  }

  test("histDrift: hand-computed TV, first-of-max drift bin, null on empty side") {
    import spark.implicits._
    // bins=4 (arrays carry under/overflow slots): h0 in-range (3,1,0,0)
    // n0=4; h1 (1,3,4,0) n1=8. Cross diffs |h0·n1 − h1·n0| = 20, 4, 16, 0
    // → l1=40, tv = 0.5·40/(4·8) = 0.625, drift bin 1
    val df = Seq((Seq(0L, 3L, 1L, 0L, 0L, 9L), Seq(2L, 1L, 3L, 4L, 0L, 0L)))
      .toDF("h0", "h1")
    val r = df.select(histDrift(col("h0"), col("h1"), 4).as("d")).select("d.*").head()
    assert(r.getAs[Long]("n0") == 4L && r.getAs[Long]("n1") == 8L)
    assert(r.getAs[java.math.BigDecimal]("l1_num").longValueExact() == 40L)
    assert(r.getAs[Double]("tv") == 0.625)
    assert(r.getAs[Int]("drift_bin") == 1)
    // identical distributions: zero distance, ties resolve to bin 1
    val same = df.select(histDrift(col("h1"), col("h1"), 4).as("d")).select("d.*").head()
    assert(same.getAs[Double]("tv") == 0.0 && same.getAs[Int]("drift_bin") == 1)
    // a side with no in-range mass has no distribution to compare
    val empty = Seq((Seq(5L, 0L, 0L, 0L, 0L, 7L), Seq(0L, 1L, 3L, 4L, 0L, 0L)))
      .toDF("h0", "h1")
      .select(histDrift(col("h0"), col("h1"), 4).as("d")).head()
    assert(empty.isNullAt(0))
  }

  test("cms sketch is SQL-callable through both registration modes") {
    graft.sql.GraftFunctions.register(spark)
    corpus(4).createOrReplaceTempView("sketch_input")
    val viaSql = spark.sql(
      "SELECT cms_sketch(h, 2, 32) AS cms, register_sketch(h, 64) AS regs FROM sketch_input")
      .head()
    assert(viaSql.getSeq[Long](0).sum == 200000L * 2)
    assert(viaSql.getSeq[Int](1).length == 64)
    val viaMergeSql = spark.sql(
      """SELECT cms_merge(cms) AS cms, register_merge(regs) AS regs FROM (
        |  SELECT key % 3 AS g, cms_sketch(h, 2, 32) AS cms, register_sketch(h, 64) AS regs
        |  FROM sketch_input GROUP BY key % 3)""".stripMargin).head()
    assert(viaMergeSql.getSeq[Long](0).sum == 200000L * 2)
    assert(viaMergeSql.getSeq[Int](1) == viaSql.getSeq[Int](1))
    // hist_sketch too (lo/hi must be DOUBLE — SQL 0.0 alone parses as
    // DECIMAL, so the SQL surface takes explicit casts for the bounds)
    val viaHistSql = spark.sql(
      """SELECT hist_sketch(CAST(key AS DOUBLE), CAST(0.0 AS DOUBLE),
        |                   CAST(10000.0 AS DOUBLE), 10)
        |FROM sketch_input""".stripMargin).head().getSeq[Long](0)
    assert(viaHistSql.length == 12 && viaHistSql.head == 0L && viaHistSql.last == 0L)
    assert(viaHistSql.slice(1, 11).forall(_ == 20000L), s"uneven: $viaHistSql")
  }
}
