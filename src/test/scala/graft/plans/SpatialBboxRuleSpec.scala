package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.{GeoExprs, GeoWithinKm}

/** The native radius predicate + its bbox-injection optimizer rule:
  * semantics identical to the composed haversine filter, box provably
  * lossless (over-covering) including the high-latitude edge case, and the
  * injected ranges reach the parquet scan as pushed filters.
  */
class SpatialBboxRuleSpec extends SparkSpec {

  private def registered = { graft.sql.GraftFunctions.register(spark); spark }

  /** Deterministic point cloud around a center, dense near the radius
    * boundary at HIGH latitude — where a naive center-cosine box clips.
    */
  private def points(cLat: Double, cLon: Double): DataFrame =
    registered.range(4000).select(
      col("id"),
      (lit(cLat) + (col("id") % 63 - 31) / 7.0).as("lat"),
      (lit(cLon) + (col("id") % 67 - 33) / 5.0).as("lon"))

  test("geo_within_km matches the composed haversine predicate row-for-row") {
    val df = points(60.0, -135.0)
    val exact = df.where(
      GeoExprs.haversineKm(col("lat"), col("lon"), lit(60.0), lit(-135.0)) <= 300.0)
      .select("id").collect().map(_.getLong(0)).toSet
    val native = df.where(GeoWithinKm.geoWithinKm(
      col("lat"), col("lon"), lit(60.0), lit(-135.0), lit(300.0)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(native == exact)
    assert(native.nonEmpty && native.size < 4000, "boundary must split the cloud")
  }

  test("null coordinates are filtered, not matched") {
    val df = registered.range(10).select(
      col("id"),
      when(col("id") % 3 === 0, lit(null)).otherwise(lit(40.0)).cast("double").as("lat"),
      lit(-105.0).as("lon"))
    val kept = df.where(GeoWithinKm.geoWithinKm(
      col("lat"), col("lon"), lit(40.0), lit(-105.0), lit(5.0))).count()
    assert(kept == 10 - 4) // ids 0,3,6,9 have null lat
  }

  test("rule injects a lossless box: optimized result == unoptimized, box visible in plan") {
    val df = points(61.5, 140.0) // high latitude: lon-delta must use the edge cosine
    val q = df.where(GeoWithinKm.geoWithinKm(
      col("lat"), col("lon"), lit(61.5), lit(140.0), lit(450.0)))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains(">=") && optimized.contains("<="),
      s"bbox ranges missing from optimized plan:\n$optimized")
    assert(optimized.contains("geowithinkm") || optimized.toLowerCase.contains("geo"),
      "exact predicate must remain alongside the box")
    // losslessness: same rows as the raw haversine filter (no rule involved)
    val exact = df.where(
      GeoExprs.haversineKm(col("lat"), col("lon"), lit(61.5), lit(140.0)) <= 450.0)
      .select("id").collect().map(_.getLong(0)).toSet
    val viaRule = q.select("id").collect().map(_.getLong(0)).toSet
    assert(viaRule == exact)
    assert(viaRule.nonEmpty)
  }

  test("negated predicate with null coords: no injection, 3VL preserved") {
    // under NOT, g → (box AND g) would turn NULL into FALSE and NOT(FALSE)
    // into TRUE — keeping rows the un-rewritten query drops. The rule must
    // only touch top-level Filter conjuncts.
    val df = registered.range(3).select(
      col("id"),
      when(col("id") === 1, lit(null)).otherwise(lit(80.0)).cast("double").as("lat"),
      when(col("id") === 2, lit(null)).otherwise(lit(10.0)).cast("double").as("lon"))
    val q = df.where(!GeoWithinKm.geoWithinKm(
      col("lat"), col("lon"), lit(40.0), lit(-105.0), lit(100.0)))
    val ids = q.select("id").collect().map(_.getLong(0)).toSet
    // id 0 is far outside the radius (NOT true → kept); ids 1/2 have a null
    // coordinate (predicate NULL, NOT(NULL) = NULL → dropped)
    assert(ids == Set(0L), s"3VL broken: got $ids")
  }

  test("polar and antimeridian centers skip injection but stay correct") {
    for ((cLat, cLon) <- Seq((89.7, 10.0), (45.0, 179.95))) {
      val df = points(cLat, cLon)
      val native = df.where(GeoWithinKm.geoWithinKm(
        col("lat"), col("lon"), lit(cLat), lit(cLon), lit(500.0)))
        .select("id").collect().map(_.getLong(0)).toSet
      val exact = df.where(
        GeoExprs.haversineKm(col("lat"), col("lon"), lit(cLat), lit(cLon)) <= 500.0)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(native == exact, s"center ($cLat, $cLon)")
    }
  }

  test("injected box reaches the parquet scan as pushed filters") {
    val dirPath = java.nio.file.Files.createTempDirectory("geo_pushdown")
    val dir = dirPath.toString
    points(40.0, -105.0).write.mode("overwrite").parquet(dir)
    try {
    val q = registered.read.parquet(dir).where(GeoWithinKm.geoWithinKm(
      col("lat"), col("lon"), lit(40.0), lit(-105.0), lit(200.0)))
    val physical = q.queryExecution.executedPlan.toString
    // the plan string elides long filter lists ("...") — assert on the
    // lat bounds plus the lon range in DataFilters, which survive the cut
    assert(physical.contains("PushedFilters: [GreaterThanOrEqual(lat") &&
      physical.contains("LessThanOrEqual(lat") &&
      physical.contains("(lon"),
      s"bbox not pushed to the scan:\n$physical")
    // and the scan answers correctly
    val exact = registered.read.parquet(dir).where(
      GeoExprs.haversineKm(col("lat"), col("lon"), lit(40.0), lit(-105.0)) <= 200.0)
      .count()
    assert(q.count() == exact && exact > 0)
    } finally { // don't accumulate parquet temp dirs across runs
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("SQL surface: geo_within_km is callable and rule-optimized") {
    registered
    points(40.0, -105.0).createOrReplaceTempView("geo_pts")
    val n = spark.sql(
      "SELECT count(*) FROM geo_pts WHERE geo_within_km(lat, lon, 40.0D, -105.0D, 150.0D)")
      .head().getLong(0)
    val exact = points(40.0, -105.0).where(
      GeoExprs.haversineKm(col("lat"), col("lon"), lit(40.0), lit(-105.0)) <= 150.0).count()
    assert(n == exact)
  }
}
