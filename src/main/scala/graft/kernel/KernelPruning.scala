package graft.kernel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.WeightExprs

/** Influence-floor-driven spatial pruning for the scoring kernel — the
  * 100 TB path (SURVEY §7.3(d), O8/O12).
  *
  * The exact kernel is a cross join: every route × every accident. At
  * reference scale (168K × 6.9K) brute force is fine; at 100× routes the
  * dominated cost is pairs whose influence is guaranteed below the
  * significance floor (O8: 1e-6, `location_safety_computation.py:406-411`).
  * Since every non-spatial factor is bounded above
  * (temporal ≤ 1.05, elevation ≤ 1.15, route-type ≤ 1.0, severity ≤ 1.3,
  * grade ≤ 1.0, weather ≤ 1.0 unamplified), influence ≥ floor requires
  *
  * {{{ spatial = exp(-d²/2h²) ≥ floor / B   ⇒   d ≤ h·√(2·ln(B/floor)) }}}
  *
  * with B the product of those bounds. Bucketing both sides into a
  * lat/lon grid of cell size ≥ that radius turns the cross join into an
  * EQUI-join on cell id with a 3×3 neighborhood fan-out on the (small)
  * accidents side: routes shuffle/scan ONCE, join key cardinality is the
  * grid, and per-route work drops from |accidents| to |accidents within
  * ~2 cells|. Lossless above the floor: any pair within the radius shares
  * adjacent cells, so only sub-floor pairs are dropped — total risk error
  * per route is < |accidents|·floor·7 (≈ 0.05 risk points at 6.9K
  * accidents), and exactly 0 for every pair the exact kernel would keep
  * with influence ≥ floor.
  */
object KernelPruning {

  /** Upper bound on the non-spatial factor product (unamplified weather). */
  val NonSpatialBound: Double =
    1.05 * 1.15 * 1.0 * WeightExprs.SeverityWeights("fatal") * 1.0 * 1.0

  /** Conservative prune radius (km) for a floor, using the LARGEST spatial
    * bandwidth (alpine 75 km) — per-type refinement would prune more but
    * the global bound keeps the cell grid uniform.
    */
  def pruneRadiusKm(floor: Double): Double = {
    val hMax = WeightExprs.SpatialBandwidth.values.max
    hMax * math.sqrt(2.0 * math.log(NonSpatialBound / floor))
  }

  private val KmPerDegLat = 111.0

  /** Longitude cell COUNT for a prune radius: the largest count whose
    * uniform cell width (360/count degrees) still covers the radius at
    * `maxAbsLat`. A count that divides 360 evenly is what makes the
    * antimeridian seam safe — every cell has the same width, so ±1
    * wrap-around neighbors always cover the radius (a non-dividing cell
    * size would leave a narrow final cell through which an in-radius pair
    * could sit two cells apart).
    */
  private def lonCells(radiusKm: Double, maxAbsLat: Double): Long = {
    val minDeg = radiusKm / (KmPerDegLat * math.cos(math.toRadians(maxAbsLat)))
    math.max(1L, math.floor(360.0 / minDeg).toLong)
  }

  /** Grid-cell assignment: (latCell, lonCell). Latitude cells are plain
    * floor-buckets (no wrap); longitude cells index a uniform [0, n) ring
    * so the accident fan-out can wrap modulo n across ±180°.
    */
  private def cellIds(lat: Column, lon: Column, radiusKm: Double,
                      maxAbsLat: Double): (Column, Column) = {
    val latDeg = radiusKm / KmPerDegLat
    val n = lonCells(radiusKm, maxAbsLat)
    val lonCell = pmod(floor((lon + 180.0) / (360.0 / n)).cast("long"), lit(n))
    (floor(lat / latDeg).cast("long"), lonCell)
  }

  /** The pruned pair stream: same columns as SafetyKernel.pairInfluence,
    * containing every pair within the prune radius (superset of all pairs
    * with influence ≥ floor). Accidents fan out to their 3×3 cell
    * neighborhood (9× a small table) and the join is a broadcast EQUI-join
    * on cell id — no cross join anywhere in the plan.
    */
  def pairInfluencePruned(routes: DataFrame, accidents: DataFrame, planDate: Column,
                          floor: Double = SafetyKernel.SignificanceFloor,
                          maxAbsLat: Double = 72.0): DataFrame = {
    val r = pruneRadiusKm(floor)
    val nLon = lonCells(r, maxAbsLat)
    val (rLatCell, rLonCell) = cellIds(col("lat"), col("lon"), r, maxAbsLat)
    // balanced like the exact path: a single-split routes scan would run
    // the whole pruned kernel on one core (graft.Partitioning.balanced)
    val routesCelled = SafetyKernel.enrichRoutes(graft.Partitioning.balanced(routes))
      .withColumn("__cell_lat", rLatCell)
      .withColumn("__cell_lon", rLonCell)

    val (aLatCell, aLonCell) = cellIds(col("a_lat"), col("a_lon"), r, maxAbsLat)
    val accCelled = SafetyKernel.enrichAccidents(accidents, planDate)
      .withColumn("__a_cell_lat", aLatCell)
      .withColumn("__a_cell_lon", aLonCell)
      .withColumn("__dlat", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dlon", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__cell_lat", col("__a_cell_lat") + col("__dlat"))
      // wrap-around: the lon ring is uniform, so modulo adjacency is exact
      // across the ±180° seam
      .withColumn("__cell_lon", pmod(col("__a_cell_lon") + col("__dlon"), lit(nLon)))
      .drop("__a_cell_lat", "__a_cell_lon", "__dlat", "__dlon")

    val joined = routesCelled.join(broadcast(accCelled), Seq("__cell_lat", "__cell_lon"))
      .drop("__cell_lat", "__cell_lon")
    // PER-TYPE radius gate, sharper than the (uniform, h_max-sized) grid:
    // a pair with influence ≥ floor needs spatial ≥ floor/B, i.e.
    // d ≤ h_route·√(2·ln(B/floor)). The grid can't use per-type cells (the
    // equi-join key must be uniform), but the post-join filter can — narrow
    // types (sport h=25 vs alpine 75) drop ~(1−(25/75)²) ≈ 89% of their
    // cell-neighborhood pairs BEFORE any factor math. Still lossless above
    // the floor: only pairs with guaranteed sub-floor influence are cut.
    val radiusFactor = math.sqrt(2.0 * math.log(NonSpatialBound / floor))
    val gated = joined
      // enrichment hoisted both cos(lat)s — bit-identical to the inline form
      .withColumn("dist_km", graft.expr.GeoExprs.haversineKmHoisted(
        col("__coslat"), col("lat"), col("lon"),
        col("__a_coslat"), col("a_lat"), col("a_lon")))
      .where(col("dist_km") <= col("__h") * radiusFactor)
    SafetyKernel.influenceColumns(gated)
  }

  /** Pruned end-to-end scoring — drop-in for SafetyKernel.scoreRoutes with
    * bounded error below the floor. Routes with NO accident within the
    * prune radius are re-attached with risk 0 (the exact kernel gives them
    * a sub-floor positive risk; both round to green/0-ish, and the serving
    * layer treats missing as 0 — documented divergence below the floor).
    *
    * DOMAIN: losslessness above the floor holds for |lat| ≤ `maxAbsLat`
    * (default 72° — raise it for polar data at the cost of more lon
    * cells). Longitude wraps correctly across ±180° (uniform cell ring,
    * modulo fan-out). Rows beyond `maxAbsLat` can silently miss in-radius
    * pairs — route polar workloads through the exact kernel or a higher
    * `maxAbsLat`.
    */
  def scoreRoutesPruned(routes: DataFrame, accidents: DataFrame, planDate: Column,
                        floor: Double = SafetyKernel.SignificanceFloor,
                        maxAbsLat: Double = 72.0): DataFrame = {
    val scored = SafetyKernel.scoreRoutes(
      pairInfluencePruned(routes, accidents, planDate, floor, maxAbsLat))
    routes.select("route_id").join(scored, Seq("route_id"), "left")
      .na.fill(Map("total_influence" -> 0.0, "n_contributing" -> 0L, "risk_score" -> 0.0))
      .na.fill(Map("color_code" -> "green"))
  }
}
