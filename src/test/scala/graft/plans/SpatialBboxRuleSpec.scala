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

  test("null center literal: no injection, no crash, zero rows") {
    // CAST(NULL AS DOUBLE) folds to Literal(null, DoubleType) in the same
    // optimizer batch the rule runs in. The rule must leave it uninjected
    // (predicate is NULL for every row → Filter drops all) rather than
    // MatchError inside injectBox's non-null binding.
    val df = points(40.0, -105.0)
    df.createOrReplaceTempView("geo_null_center")
    val viaSql = registered.sql(
      "SELECT count(*) FROM geo_null_center " +
        "WHERE geo_within_km(lat, lon, CAST(NULL AS DOUBLE), -105.0D, 100.0D)")
      .head().getLong(0)
    assert(viaSql == 0L)
    val viaApi = df.where(GeoWithinKm.geoWithinKm(
      col("lat"), col("lon"), lit(null).cast("double"), lit(-105.0), lit(100.0))).count()
    assert(viaApi == 0L)
    // null radius takes the same uninjected path
    val nullRadius = df.where(GeoWithinKm.geoWithinKm(
      col("lat"), col("lon"), lit(40.0), lit(-105.0), lit(null).cast("double"))).count()
    assert(nullRadius == 0L)
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

  test("on a z-sorted layout the injected box SKIPS row groups — scan output shrinks") {
    // end-to-end 100 TB story: mortonKey-sorted files have tight lat/lon
    // row-group stats; the rule's pushed range predicates let the parquet
    // reader skip whole row groups, so the radius query's scan emits a
    // fraction of the table. The un-assisted haversine filter (no rule
    // node) scans everything — that's the measured difference.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dirPath = java.nio.file.Files.createTempDirectory("geo_zskip")
    val dir = dirPath.toString
    val n = 200000L
    registered.range(n).select(
      col("id"),
      (lit(35.0) + (col("id") % 2000) / 100.0).as("lat"),
      (lit(-125.0) + ((col("id") * 7919) % 3000) / 100.0).as("lon"))
      .withColumn("z", graft.expr.GeoExprs.mortonKey(col("lat"), col("lon"), 16))
      .repartitionByRange(8, col("z")).sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(dir)
    def scannedRows(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numOutputRows").value).sum
    }
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // stable metric access
    try {
      val withRule = scannedRows(spark.read.parquet(dir).where(
        GeoWithinKm.geoWithinKm(col("lat"), col("lon"), lit(40.0), lit(-110.0), lit(30.0))))
      val noRule = scannedRows(spark.read.parquet(dir).where(
        GeoExprs.haversineKm(col("lat"), col("lon"), lit(40.0), lit(-110.0)) <= 30.0))
      assert(noRule == n, s"control should scan the whole table, got $noRule")
      assert(withRule < n / 2,
        s"box pushdown skipped nothing: scanned $withRule of $n")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("property: the box contains the ENTIRE cap for random centers/radii") {
    // worst case is the cap BOUNDARY: walk the destination-point formula
    // around the circle at exactly r and require every boundary point
    // inside the box. 2000 random configs × 64 bearings, plus interior
    // points via smaller radii. Seeded — failures reproduce.
    val rnd = new scala.util.Random(20260813)
    val R = graft.expr.GeoExprs.EarthRadiusKm
    var tested = 0
    (1 to 2000).foreach { _ =>
      val cLat = rnd.nextDouble() * 178.0 - 89.0
      val cLon = rnd.nextDouble() * 360.0 - 180.0
      val r = math.pow(10.0, rnd.nextDouble() * 3.3) // 1 .. ~2000 km
      SpatialBboxRule.boxBounds(cLat, cLon, r).foreach {
        case (latLo, latHi, lonLo, lonHi) =>
          tested += 1
          val d = r / R
          (0 until 64).foreach { i =>
            val th = i * math.Pi / 32.0
            val f1 = math.toRadians(cLat)
            val lat2 = math.asin(math.sin(f1) * math.cos(d) +
              math.cos(f1) * math.sin(d) * math.cos(th))
            val lon2 = math.toRadians(cLon) + math.atan2(
              math.sin(th) * math.sin(d) * math.cos(f1),
              math.cos(d) - math.sin(f1) * math.sin(lat2))
            val (pLat, pLon) = (math.toDegrees(lat2), math.toDegrees(lon2))
            // boundary points can land across ±180 only if the box did too,
            // which boxBounds rejects — so pLon needs no wrapping here
            assert(pLat >= latLo - 1e-9 && pLat <= latHi + 1e-9,
              s"cap boundary lat $pLat outside [$latLo, $latHi] (c=($cLat,$cLon), r=$r)")
            assert(pLon >= lonLo - 1e-9 && pLon <= lonHi + 1e-9,
              s"cap boundary lon $pLon outside [$lonLo, $lonHi] (c=($cLat,$cLon), r=$r)")
          }
      }
    }
    assert(tested > 1000, s"only $tested configs were injectable — generator broken?")
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
