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
  * lat/lon grid (cell size radius/K, see CellDiv) turns the cross join
  * into an EQUI-join on cell id with a (2K+1)² neighborhood fan-out on
  * the (small) accidents side: routes shuffle/scan ONCE, join key
  * cardinality is the grid, and per-route work drops from |accidents| to
  * |accidents within the window|. Lossless above the floor: any pair
  * within the radius sits ≤ K cells apart per axis, so only sub-floor
  * pairs are dropped — total risk error per route is <
  * |accidents|·floor·7 (≈ 0.05 risk points at 6.9K accidents), and
  * exactly 0 for every pair the exact kernel would keep with influence
  * ≥ floor.
  */
object KernelPruning {

  /** Upper bound on the non-spatial factor product (unamplified weather). */
  val NonSpatialBound: Double =
    1.05 * 1.15 * 1.0 * WeightExprs.SeverityWeights("fatal") * 1.0 * 1.0

  /** The ONE hMax both the public radius and the tier grid derive from —
    * two independent maxes here could silently diverge (the map's max and
    * the default bandwidth only happen to order the same way today).
    */
  private val HMaxKm: Double =
    (WeightExprs.SpatialBandwidth.values.toSet + WeightExprs.SpatialBandwidthDefault).max

  /** Conservative prune radius (km) for a floor, using the LARGEST spatial
    * bandwidth (alpine 75 km) — per-type refinement would prune more but
    * the global bound keeps the cell grid uniform. `weatherBound` is the
    * caller's upper bound on the A7 multiplier when the route side carries
    * `wmult` (amplified weather factor = (wsim·wmult)³ can exceed the
    * unamplified ≤ 1 assumption); 1.0 = unamplified.
    */
  def pruneRadiusKm(floor: Double, weatherBound: Double = 1.0): Double =
    HMaxKm * radiusFactorFor(floor, weatherBound)

  private def radiusFactorFor(floor: Double, weatherBound: Double): Double =
    math.sqrt(2.0 * math.log(
      NonSpatialBound * math.pow(weatherBound, WeightExprs.WeatherPower) / floor))

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

  /** Bandwidth TIERS for the grid: every route's bandwidth maps UP to the
    * smallest tier ≥ it, and each tier gets its own (cell size, lon ring)
    * grid — still lossless (the tier radius covers the route's true gate
    * radius) but a sport route (h=25) now searches ~(30/75)² ≈ 6× less
    * area than under a uniform h_max grid. Three tiers balance candidate
    * reduction against plan/broadcast duplication (one 9× accident fan-out
    * per tier).
    */
  private[kernel] val RadiusTierKm: Seq[Double] =
    Seq(30.0, 60.0, HMaxKm).filter(_ <= HMaxKm).distinct.sorted

  /** Cells-per-gate-radius K: cell size = tierRadius / K, fan-out ±K.
    * K=2 (25-cell windows) measured best at the 10× batch; K=1 is the
    * classic 3×3. Raising K further shaves candidates sublinearly
    * ((2+1/K)² → 4) while the broadcast fan-out grows as (2K+1)². */
  private val CellDiv = 2

  /** Tier-0 cell extents in degrees (lat, lon) under the default floor —
    * the geometry tests and benches need to plant geo-skew STRICTLY
    * INSIDE one grid cell (the "half the catalog in one crag" workload).
    * Derived from the same constants as pairInfluencePruned, so a tier
    * or CellDiv change moves the plant with it.
    */
  private[graft] def tier0CellDegrees(maxAbsLat: Double = 72.0): (Double, Double) = {
    val cellKm = RadiusTierKm.head *
      radiusFactorFor(SafetyKernel.SignificanceFloor, 1.0) / CellDiv
    (cellKm / KmPerDegLat, 360.0 / lonCells(cellKm, maxAbsLat))
  }

  private def tierOf(h: Column): Column =
    RadiusTierKm.zipWithIndex.dropRight(1)
      .foldLeft(when(lit(false), lit(0))) { case (acc, (t, i)) => acc.when(h <= t, i) }
      .otherwise(RadiusTierKm.length - 1)

  /** Per-tier chained lookup: `exprs(i)` where `tier` = i. */
  private def byTier(tier: Column, exprs: Seq[Column]): Column =
    exprs.zipWithIndex.dropRight(1)
      .foldLeft(when(lit(false), exprs.head)) { case (acc, (e, i)) => acc.when(tier === i, e) }
      .otherwise(exprs.last)

  /** The pruned pair stream: same columns as SafetyKernel.pairInfluence,
    * containing every pair within the per-route prune radius (superset of
    * all pairs with influence ≥ floor). ONE broadcast equi-join on the
    * composite key (tier, latCell, lonCell): each route probes with its own
    * tier's grid; accidents fan out to every tier × the (2K+1)²
    * neighborhood (75× a small table at K=2 — one broadcast, one codegen
    * stage). No cross join anywhere in the plan; a route sits in exactly
    * one tier, so no pair can be produced twice.
    *
    * Candidate → pair funnel, cheapest test first:
    *  1. tier grid membership (the equi-join itself) — K=2 cells shrink
    *     the window area to 6.25r² from the classic 3×3's 9r²;
    *  2. a latitude-only prefilter — true distance ≥ 111.19·|Δlat| km, so
    *     111·|Δlat| > gate ⇒ the pair is out; one subtraction+compare
    *     for every cell-window candidate;
    *  3. a longitude prefilter from the haversine identity (see inline
    *     note) — one sqrt + one |sin| using the hoisted cosines, sound at
    *     every latitude and across the ±180° seam;
    *  4. exact haversine against the per-route gate radius
    *     d ≤ h_route·√(2·ln(B/floor)) — sharper than any grid, since it
    *     uses the route's own bandwidth, not the tier's.
    *
    * Measured at the 10× batch (1.68M × 69K, same host/session): 3×3 no
    * lon-filter 157.6 s → K=2 + both prefilters 133.8 s (−15%); K=3 and
    * prefilter-less K=2 are both WORSE (fan-out cost / haversine volume),
    * so (K=2, lat, lon) is the chosen point.
    */
  def pairInfluencePruned(routes: DataFrame, accidents: DataFrame, planDate: Column,
                          floor: Double = SafetyKernel.SignificanceFloor,
                          maxAbsLat: Double = 72.0,
                          weatherBound: Double = 1.0): DataFrame = {
    // an amplified-weather frame (route-side wmult, A7) breaks the
    // B-product the radius derives from: (wsim·wmult)³ can exceed 1, so an
    // above-floor pair could sit beyond the unamplified gate and be lost
    // SILENTLY. Make the caller state their multiplier cap; the declared
    // cap is then VERIFIED against the data at execution (below) — a
    // weatherBound smaller than an actual wmult fails the job instead of
    // silently losing above-floor pairs.
    require(!routes.columns.contains("wmult") || weatherBound > 1.0,
      "routes carry wmult (amplified weather): pass weatherBound ≥ the max " +
        "multiplier so the prune radius still bounds influence above the floor")
    val radiusFactor = radiusFactorFor(floor, weatherBound)
    val tierRadii = RadiusTierKm.map(_ * radiusFactor)
    // FINER cells than the gate radius: cell size r/K with a (2K+1)²
    // fan-out window shrinks the candidate area from (3r)² = 9r² (K=1) to
    // ((2+1/K)·r)² — 6.25r² at K=2, a ~30% candidate cut for 25 cells of
    // accident fan-out instead of 9 (the fan-out side is the SMALL
    // broadcast table, so the trade buys per-pair work with cheap rows).
    // Coverage stays exact: |Δcell| ≤ ceil(r/s) = K per axis, and each lon
    // ring's cell width ≥ r_deg/K, so ±K ring cells span ≥ r_deg at
    // maxAbsLat — same lossless-above-the-floor argument as K=1.
    val latDegs = tierRadii.map(_ / CellDiv / KmPerDegLat)
    val nLons = tierRadii.map(r => lonCells(r / CellDiv, maxAbsLat))

    // the `floor` PARAMETER shadows functions.floor in this scope
    val F = org.apache.spark.sql.functions
    def latCellFor(lat: Column, tier: Column): Column =
      byTier(tier, latDegs.map(d => F.floor(lat / d).cast("long")))
    def lonCellFor(lon: Column, tier: Column): Column =
      byTier(tier, nLons.map(n =>
        pmod(F.floor((lon + 180.0) / (360.0 / n)).cast("long"), lit(n))))

    // balanced like the exact path: a single-split routes scan would run
    // the whole pruned kernel on one core (graft.Partitioning.balanced)
    // runtime twin of the weatherBound require: one compare per ROUTE (not
    // per pair) that raise_error's on the first wmult above the declared
    // cap. The otherwise-branch keeps the predicate non-foldable, so the
    // optimizer cannot prove it away; cost is negligible pre-fan-out.
    val routesChecked =
      if (routes.columns.contains("wmult"))
        routes.where(when(col("wmult").isNull || col("wmult") <= weatherBound, lit(true))
          .otherwise(raise_error(concat(
            lit("pruned kernel: wmult="), col("wmult"),
            lit(s" exceeds declared weatherBound=$weatherBound — " +
              "above-floor pairs would be silently lost")))))
      else routes
    val routesCelled = SafetyKernel.enrichRoutes(graft.Partitioning.balanced(routesChecked))
      .withColumn("__tier", tierOf(col("__h")))
      .withColumn("__cell_lat", latCellFor(col("lat"), col("__tier")))
      .withColumn("__cell_lon", lonCellFor(col("lon"), col("__tier")))

    val accCelled = SafetyKernel.enrichAccidents(accidents, planDate)
      .withColumn("__tier", explode(array(RadiusTierKm.indices.map(i => lit(i)): _*)))
      .withColumn("__a_cell_lat", latCellFor(col("a_lat"), col("__tier")))
      .withColumn("__a_cell_lon", lonCellFor(col("a_lon"), col("__tier")))
      .withColumn("__dlat",
        explode(array((-CellDiv to CellDiv).map(d => lit(d.toLong)): _*)))
      // per-tier offset list, DISTINCT after the modulo: a polar-friendly
      // maxAbsLat can shrink a tier's lon ring to n ≤ 2K cells, where the
      // constant ±K fan-out collapses to duplicate (tier, cell) keys and
      // every pair in that tier gets multiple influence. A small ring
      // needs only {0 … n-1} — still full ring coverage, no duplicates.
      .withColumn("__dlon", explode(byTier(col("__tier"), nLons.map { n =>
        val offs =
          if (n >= 2L * CellDiv + 1) (-CellDiv.toLong to CellDiv.toLong).toSeq
          else 0L until n
        array(offs.map(lit): _*)
      })))
      .withColumn("__cell_lat", col("__a_cell_lat") + col("__dlat"))
      // wrap-around: each tier's lon ring is uniform, so modulo adjacency
      // is exact across the ±180° seam
      .withColumn("__cell_lon", byTier(col("__tier"),
        nLons.map(n => pmod(col("__a_cell_lon") + col("__dlon"), lit(n)))))
      .drop("__a_cell_lat", "__a_cell_lon", "__dlat", "__dlon")

    val joined = routesCelled
      .join(broadcast(accCelled), Seq("__tier", "__cell_lat", "__cell_lon"))
      .drop("__tier", "__cell_lat", "__cell_lon")

    val gated = joined
      // step 2: latitude prefilter (111.0 < 111.19 km/° keeps it sound)
      .where(abs(col("lat") - col("a_lat")) * KmPerDegLat <=
        col("__h") * radiusFactor)
      // step 2b: LONGITUDE prefilter — a sound great-circle lower bound
      // from the haversine identity: sin²(d/2R) ≥ cosφ₁·cosφ₂·sin²(Δλ/2)
      // and asin(y) ≥ y on [0,1], hence d ≥ 2R·√(cosφ₁cosφ₂)·|sin(Δλ/2)|.
      // (The naive 111·Δλ·min(cos) parallel-distance bound is UNSOUND at
      // high latitude — the over-the-pole great circle undercuts it.)
      // Both cosines are hoisted by enrichment; |sin| makes the bound
      // wrap-correct across ±180° for free. One sqrt + one sin kills the
      // lon-far majority of each cell window before the full haversine.
      .where(lit(2.0 * graft.expr.GeoExprs.EarthRadiusKm) *
        sqrt(col("__coslat") * col("__a_coslat")) *
        abs(sin(radians(col("lon") - col("a_lon")) / 2.0)) <=
        col("__h") * radiusFactor)
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
    * (default 72° — raise it for polar data; that WIDENS the longitude
    * cells, i.e. fewer of them and coarser pruning at low latitudes, not
    * more). Longitude wraps correctly across ±180° (uniform cell ring,
    * modulo fan-out; rings of 1-2 cells fan out with distinct offsets
    * only). Rows beyond `maxAbsLat` can silently miss in-radius pairs —
    * route polar workloads through the exact kernel or a higher
    * `maxAbsLat`. `weatherBound`: required > 1 when `routes` carries the
    * A7 `wmult` column (see pairInfluencePruned).
    */
  def scoreRoutesPruned(routes: DataFrame, accidents: DataFrame, planDate: Column,
                        floor: Double = SafetyKernel.SignificanceFloor,
                        maxAbsLat: Double = 72.0,
                        weatherBound: Double = 1.0): DataFrame = {
    val scored = SafetyKernel.scoreRoutes(
      pairInfluencePruned(routes, accidents, planDate, floor, maxAbsLat, weatherBound))
    routes.select("route_id").join(scored, Seq("route_id"), "left")
      .na.fill(Map("total_influence" -> 0.0, "n_contributing" -> 0L, "risk_score" -> 0.0))
      .na.fill(Map("color_code" -> "green"))
  }
}
