package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order locality layout: key correctness against a reference
  * interleaver, and the actual FILE-SKIPPING effect — the same box query
  * must read far fewer parquet files from a z-clustered table than from a
  * hash-distributed one.
  */
class GeoLayoutSpec extends SparkSpec {

  import spark.implicits._

  private def refMorton(lat: Double, lon: Double, bits: Int): Long = {
    val scale = (1L << bits) - 1
    val latQ = math.floor((lat + 90.0) / 180.0 * scale).toLong
    val lonQ = math.floor((lon + 180.0) / 360.0 * scale).toLong
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((latQ >> i) & 1L) << (2 * i + 1)) | (((lonQ >> i) & 1L) << (2 * i))
    }
  }

  test("mortonKey matches the reference interleaver on sampled coordinates") {
    val coords = Seq((0.0, 0.0), (89.9999, 179.9999), (-90.0, -180.0),
      (40.2549, -105.6160), (37.73, -119.55), (-33.86, 151.2))
    val got = coords.toDF("lat", "lon")
      .select(GeoExprs.mortonKey(col("lat"), col("lon"), 16).as("z"))
      .collect().map(_.getLong(0))
    coords.zip(got).foreach { case ((la, lo), z) =>
      assert(z == refMorton(la, lo, 16), s"($la, $lo)")
    }
  }

  test("z-clustered files carry tight min/max stats; hash layout cannot skip") {
    // 100k points over a 20°×30° region, 40 output files per layout
    val pts = spark.range(100000).select(
      col("id"),
      (lit(35.0) + (col("id") % 2000) / 100.0).as("lat"),
      (lit(-125.0) + ((col("id") * 7919) % 3000) / 100.0).as("lon"))
    val zed = pts.withColumn("z", GeoExprs.mortonKey(col("lat"), col("lon"), 16))
    val base = java.nio.file.Files.createTempDirectory("geo-layout").toString
    zed.repartitionByRange(40, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(s"$base/zorder")
    zed.repartition(40).write.mode("overwrite").parquet(s"$base/hashed")

    // per-file coordinate envelopes = exactly the parquet footer min/max a
    // stats-pruning reader consults; a file must be touched iff its
    // envelope intersects the query box
    def envelopes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("lat").as("lat_lo"), max("lat").as("lat_hi"),
        min("lon").as("lon_lo"), max("lon").as("lon_hi"))
      .collect()

    def mustTouch(env: Array[org.apache.spark.sql.Row]): Int = env.count { r =>
      r.getAs[Double]("lat_hi") >= 40.0 && r.getAs[Double]("lat_lo") <= 40.5 &&
        r.getAs[Double]("lon_hi") >= -110.0 && r.getAs[Double]("lon_lo") <= -109.5
    }

    val zEnv = envelopes(s"$base/zorder")
    val hEnv = envelopes(s"$base/hashed")
    // round-robin always fills all 40; range split samples boundaries and
    // may leave a few partitions empty (no file written)
    assert(hEnv.length == 40)
    assert(zEnv.length >= 20, s"only ${zEnv.length} z-order files")
    // hash layout: every file spans ~the whole region → nothing skippable
    assert(mustTouch(hEnv) >= hEnv.length - 1,
      s"hash layout: ${mustTouch(hEnv)} files touch")
    // z-order: the box intersects only a small fraction of tight envelopes
    assert(mustTouch(zEnv) <= math.max(2, zEnv.length / 5),
      s"z-order layout: ${mustTouch(zEnv)} of ${zEnv.length} files touch")
    // and the clustering is what did it: average per-file lat span shrinks
    // several-fold (files straddling z-curve seams keep it from ~20×)
    def avgLatSpan(env: Array[org.apache.spark.sql.Row]): Double =
      env.map(r => r.getAs[Double]("lat_hi") - r.getAs[Double]("lat_lo")).sum / env.length
    assert(avgLatSpan(zEnv) < avgLatSpan(hEnv) / 4,
      s"z ${avgLatSpan(zEnv)} vs hash ${avgLatSpan(hEnv)}")
  }
}
