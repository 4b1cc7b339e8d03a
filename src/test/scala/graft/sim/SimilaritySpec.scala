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

  test("IVF top-k: deterministic training, high recall at nprobe=4/16") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val c = e.where(col("vec_id") >= 5)
    val exact = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, c, "vec_id", "embedding",
      nlist = 16, nprobe = 4, k = 3)
    val ivfTop = ivf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivfTop).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall below floor")
    // ranking stage uses exact cosines
    assert(ivf.where(col("cosine") > 1.0001 || col("cosine") < -1.0001).count() == 0)
    // every query returns exactly k rows (cells cover the corpus)
    assert(ivf.groupBy("query_id").count().where(col("count") =!= 3).count() == 0)
    // deterministic: two trainings give identical centroids
    val c1 = Similarity.ivfTrainCentroids(c, "vec_id", "embedding", 16)
    val c2 = Similarity.ivfTrainCentroids(c, "vec_id", "embedding", 16)
    assert(c1.toSeq == c2.toSeq)
  }

  test("IVF training samples the corpus: gated path deterministic, unit centroids, recall holds") {
    val dir = "/root/testdata/sf0.01"
    val e = graft.Tables.embeddings(spark, dir) // 5000 vectors ≫ 100·16 target
    val q = e.where(col("vec_id") < 5)
    val c = e.where(col("vec_id") >= 5)
    // the md5 gate engages (target 16·100 = 1600 < corpus) and stays
    // deterministic across trainings
    val c1 = Similarity.ivfTrainCentroids(c, "vec_id", "embedding", 16)
    val c2 = Similarity.ivfTrainCentroids(c, "vec_id", "embedding", 16)
    assert(c1.toSeq == c2.toSeq)
    assert(c1.length == 16, s"expected 16 centroids, got ${c1.length}")
    c1.foreach { case (_, v) =>
      assert(approx(math.sqrt(v.map(x => x * x).sum), 1.0, 1e-9), "centroid not unit-norm")
    }
    // sampled centroids still buy real recall on the full corpus
    val exact = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfTop = Similarity.ivfTopK(q, c, "vec_id", "embedding", nlist = 16, nprobe = 4, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivfTop).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall below floor with sampled training")
    // aggressive sampling below nlist falls back to the full corpus
    val few = Similarity.ivfTrainCentroids(c.limit(20), "vec_id", "embedding",
      nlist = 16, samplePerCell = 0)
    assert(few.length == 16, "sub-nlist sample must fall back, not drop centroids")
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

  test("bucket cap drops members WHOLESALE: no id-order-dependent pairs") {
    // 300 byte-identical vectors share one bucket (size > cap); two genuine
    // near-dups live in small buckets. Capped-bucket members must appear in
    // NO pair — from either join side, whatever their ids — while the
    // outside pair survives.
    val hot = spark.range(300).select(
      (col("id") * 2 + 1).as("vec_id"), // odd ids: interleaved with others
      typedLit(Seq.fill(8)(1.0)).as("embedding"))
    val pairA = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0)),
      (1000L, Seq(1.0, 0.01, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val corpus = hot.unionByName(pairA)
    // axis-sign signature makes buckets exactly predictable (hyperplane
    // buckets depend on the seeded planes, and the hot/planted vectors could
    // collide): hot all-ones → sig 0b1111; planted → sigs 1 and 3, which are
    // hamming-1 apart, so the pair is found via the 1-bit multi-probe
    val axisSig: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      Similarity.axisSignSignature(_, 4)
    val pairs = Similarity.nearDupPairsLsh(corpus, "vec_id", "embedding",
      dim = 8, bits = 4, threshold = 0.95, maxBucketSize = Some(100),
      signature = Some(axisSig))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1000L)), s"got $pairs")
    // without a cap the hot bucket floods: 300·299/2 pairs plus the planted
    val uncapped = Similarity.nearDupPairsLsh(corpus, "vec_id", "embedding",
      dim = 8, bits = 4, threshold = 0.95, signature = Some(axisSig)).count()
    assert(uncapped == 300L * 299 / 2 + 1)
  }

  test("zero-norm queries emit no rows; short vectors don't crash axis signatures") {
    val corpus = Seq((10L, vec(1, 0, 0, 0)), (11L, vec(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, vec(1, 0, 0, 0)), (2L, vec(0, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 2)
      .select("query_id").as[Long].collect().toSet
    assert(brute == Set(1L), "zero-norm query must be excluded, not rank NaN garbage")
    val lsh = Similarity.lshTopK(queries, corpus, "vec_id", "embedding",
      dim = 4, bits = 3, k = 2).select("query_id").as[Long].collect().toSet
    assert(!lsh.contains(2L))
    val ivf = Similarity.ivfTopKWithCentroids(queries, corpus, "vec_id", "embedding",
      Array(0 -> Seq(1.0, 0.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0, 0.0)),
      nprobe = 1, k = 2).select("query_id").as[Long].collect().toSet
    assert(!ivf.contains(2L))
    // axis-sign signature over a vector SHORTER than bits: missing
    // coordinates are 0-bits, no ANSI INVALID_ARRAY_INDEX
    val short = Seq((1L, Seq(1.0, -1.0))).toDF("vec_id", "v")
    val sig = short.select(
      Similarity.axisSignSignature(col("v"), 6).as("s")).head().getLong(0)
    assert(sig == 1L, s"bit 0 set only, got $sig")
    // mislabeled centroids are rejected loudly, not silently mis-ranked
    intercept[IllegalArgumentException] {
      Similarity.ivfTopKWithCentroids(queries, corpus, "vec_id", "embedding",
        Array(1 -> Seq(1.0, 0.0, 0.0, 0.0), 0 -> Seq(0.0, 1.0, 0.0, 0.0)),
        nprobe = 1, k = 2)
    }
  }

  test("nearDupPairsLsh: precision 1.0 and recall floor on planted near-dups") {
    val dir = "/root/testdata/sf0.01"
    val e = graft.Tables.embeddings(spark, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val planted = e.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x + ((col("vec_id") + i.cast("long")) % 3 - 1).cast("double") * 0.01)
        .as("embedding"))
    val corpus = e.union(planted)

    val lsh = Similarity.nearDupPairsLsh(corpus, "vec_id", "embedding",
      dim = 64, bits = 8, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // exact truth by brute force over the 1000-vector corpus
    val a = Similarity.withNorm(corpus, "vec_id", "embedding", "id_a", "v_a", "n_a")
    val b = Similarity.withNorm(corpus, "vec_id", "embedding", "id_b", "v_b", "n_b")
    val exact = a.join(b, col("id_a") < col("id_b"))
      .where(graft.expr.VectorExprs.dot(col("v_a"), col("v_b")) /
        (col("n_a") * col("n_b")) >= 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    assert(exact.size >= 400, s"plant produced only ${exact.size} true pairs")
    assert(lsh.subsetOf(exact)) // exact-verified candidates: precision 1.0
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall below floor")
  }

  test("IVF centroids are invariant to the corpus partition layout") {
    // double partial sums depend on partition boundaries; the decimal mean
    // makes training reproducible across cluster resizes / AQE coalesce —
    // train on two very different layouts and demand bit-equal centroids
    val c = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .where(col("vec_id") >= 5)
    val one = Similarity.ivfTrainCentroids(c.repartition(1), "vec_id", "embedding", 8)
    val many = Similarity.ivfTrainCentroids(c.repartition(13), "vec_id", "embedding", 8)
    assert(one.toSeq == many.toSeq,
      "centroid training must not depend on partitioning")
  }
}
