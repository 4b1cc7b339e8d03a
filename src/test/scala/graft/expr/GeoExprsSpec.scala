package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference exact values from backend/app/utils/geo_utils.py executed on
  * the Longs Peak fixture coordinates (test_safety_algorithm.py:30-120).
  */
class GeoExprsSpec extends SparkSpec {

  test("haversine matches reference exact values") {
    val cases = Seq(
      ((40.2549, -105.6426, 40.3549, -105.6426), 11.119492664455889),
      ((40.2549, -105.6426, 41.2549, -105.6426), 111.19492664455889),
      ((0.0, 0.0, 0.0, 1.0), 111.19492664455873))
    for (((la1, lo1, la2, lo2), expected) <- cases) {
      val got = evalDouble(GeoExprs.haversineKm(lit(la1), lit(lo1), lit(la2), lit(lo2)))
      assert(approx(got, expected, 1e-9), s"$got vs $expected")
    }
  }

  test("bearing matches reference exact values, range [0,360)") {
    val cases = Seq(
      ((40.0, -105.0, 41.0, -105.0), 0.0),
      ((40.0, -105.0, 40.0, -104.0), 89.67860140748968),
      ((40.0, -105.0, 39.0, -106.0), 217.97377190356207))
    for (((la1, lo1, la2, lo2), expected) <- cases) {
      val got = evalDouble(GeoExprs.bearingDeg(lit(la1), lit(lo1), lit(la2), lit(lo2)))
      assert(approx(got, expected, 1e-9), s"$got vs $expected")
    }
  }

  test("hoisted-cosine haversine is BIT-identical to the inline form") {
    // the kernel hoists cos(lat) out of the pair loop; the reassociation
    // must not move a single ulp or the DuckDB oracle hashes would drift
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180,
      rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180))
    import spark.implicits._
    val df = pts.toDF("la1", "lo1", "la2", "lo2")
    val mismatches = df.select(
      GeoExprs.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")).as("inline"),
      GeoExprs.haversineKmHoisted(
        cos(radians(col("la1"))), col("la1"), col("lo1"),
        cos(radians(col("la2"))), col("la2"), col("lo2")).as("hoisted"))
      .where(col("inline") =!= col("hoisted")).count()
    assert(mismatches == 0)
  }

  test("bounding box deltas") {
    assert(approx(evalDouble(GeoExprs.bboxLatDelta(lit(111.0))), 1.0))
    assert(approx(evalDouble(GeoExprs.bboxLonDelta(lit(111.0), lit(0.0))), 1.0))
    assert(evalDouble(GeoExprs.bboxLonDelta(lit(111.0), lit(60.0))) > 1.9) // 1/cos60 ≈ 2
  }
}
