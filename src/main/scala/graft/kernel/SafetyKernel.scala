package graft.kernel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.{GeoExprs, WeightExprs}

/** The influence kernel — the heart of the engine (SURVEY §2.7).
  *
  * Reference dataflow (`backend/app/services/safety_algorithm.py:197-345`,
  * vectorized twin `safety_algorithm_vectorized.py:314-379`): every planned
  * route is scored against every accident —
  *
  * {{{
  * base = spatial × temporal × elevation × route_type × severity × grade
  * influence = base × weather_factor(similarity)
  * risk(route) = min(100, max(0, Σ_accidents influence × 7.0))
  * }}}
  *
  * Spark-first shape: the accidents side is small (~6.9K rows in the
  * reference; ≪ broadcast threshold even at 100× that), so the conceptual
  * cross join is a **broadcast nested-loop join** with zero shuffle on the
  * routes side; the kernel itself is one `select` of pure column arithmetic
  * (whole-stage codegen, no UDFs), followed by a hash aggregation on
  * `route_id`. At 100 TB of routes this scales linearly with route
  * partitions: no route-side shuffle until the final (already partial-
  * aggregated) groupBy, whose key cardinality = #routes.
  *
  * Expected input columns —
  *   routes:    route_id, lat, lon, elev, route_type (canonical lowercase),
  *              difficulty (nullable Double)
  *   accidents: accident_id, a_lat, a_lon, a_elev, acc_type, severity_raw,
  *              a_date, a_difficulty, and optionally wsim (weather
  *              similarity in [0,1]; missing column → neutral 0.5, the
  *              reference's missing-pattern path `safety_algorithm.py:265-269`)
  */
object SafetyKernel {

  val NeutralWeatherSimilarity = 0.5
  val SignificanceFloor = 1e-6 // O8, location_safety_computation.py:406-411

  /** THE canonical route-type list (`route_type_weights.py` key order) —
    * the kernel's matrix/index building and every oracle-side type
    * enumeration (KernelQueries.typesDf/typesValues, Sql.TypeByIdx) derive
    * from this one value, so a type added or renamed here propagates
    * everywhere or nowhere.
    */
  private[graft] val CanonicalTypes =
    Seq("alpine", "ice", "mixed", "trad", "sport", "aid", "boulder")

  /** Canonical type index (0-6) or -1; lets the per-pair path use integer
    * arithmetic instead of string comparisons.
    */
  private def typeIdx(typeLc: Column): Column =
    CanonicalTypes.zipWithIndex.foldLeft(when(lit(false), lit(0))) {
      case (acc, (t, i)) => acc.when(typeLc === t, i)
    }.otherwise(-1)

  /** The 7×7 matrix flattened route-major for int-indexed lookup. */
  private val rtMatrixFlat: Seq[Double] =
    for (p <- CanonicalTypes; a <- CanonicalTypes)
      yield WeightExprs.RouteTypeWeights((p, a))

  /** Per-(route × accident) influence decomposition over a broadcast cross
    * join. Returns the pair grain with every factor as its own column —
    * downstream ops (risk agg, top-k breakdown, factor-contribution
    * analytics A13) all derive from this one plan.
    *
    * Everything that depends on only ONE side is computed BEFORE the join
    * (type-bandwidth/λ/elevation-constant per route; severity weight,
    * season flag, day count per accident) so the O(routes × accidents)
    * inner loop is pure numeric trig/exp — no string ops, no when-chains
    * over strings. Results are bit-identical to the reference composition
    * (the hoisted values are the same values, evaluated once).
    */
  def pairInfluence(routes: DataFrame, accidents: DataFrame, planDate: Column): DataFrame =
    influenceColumns(
      enrichRoutes(balance(routes)).crossJoin(broadcast(enrichAccidents(accidents, planDate))))

  /** The broadcast-NLJ kernel parallelizes over ROUTE partitions only — a
    * small single-file parquet scan (one split) would run the whole
    * routes × accidents loop on one core (graft.Partitioning.balanced).
    */
  private def balance(routes: DataFrame): DataFrame = graft.Partitioning.balanced(routes)

  /** Route-side enrichment: every type-dependent constant hoisted out of
    * the pair loop.
    */
  def enrichRoutes(routes: DataFrame): DataFrame = {
    val routesEnriched = routes
      .withColumn("__rt_lc", lower(col("route_type")))
      .withColumn("__h", WeightExprs.spatialBandwidthKm(col("__rt_lc")))
      .withColumn("__lam", WeightExprs.temporalLambda(col("__rt_lc")))
      .withColumn("__elev_c",
        WeightExprs.ElevationDecayConstant.foldLeft(when(lit(false), lit(0.0))) {
          case (acc, (k, v)) => acc.when(col("__rt_lc") === k, v)
        }.otherwise(WeightExprs.ElevationDecayDefault))
      .withColumn("__rt_idx", typeIdx(col("__rt_lc")))
      // pair-loop hoists: cos(lat) for the haversine, 2h² for the spatial
      // Gaussian — both depend on the route row only
      .withColumn("__coslat", cos(radians(col("lat"))))
      .withColumn("__two_h2", lit(2.0) * pow(col("__h"), 2))
    routesEnriched
  }

  /** Accident-side enrichment: severity weight, type index, day count,
    * season flag, weather factor — all per accident, never per pair.
    */
  def enrichAccidents(accidents: DataFrame, planDate: Column): DataFrame = {
    val accBase =
      if (accidents.columns.contains("wsim")) accidents
      else accidents.withColumn("wsim", lit(NeutralWeatherSimilarity))
    val accEnriched = accBase
      .withColumn("__sev_w", WeightExprs.severityWeightKernel(col("severity_raw")))
      .withColumn("__acc_idx", typeIdx(lower(col("acc_type"))))
      .withColumn("__days", abs(datediff(planDate, col("a_date"))).cast("double"))
      .withColumn("__same_season",
        WeightExprs.seasonOf(planDate) === WeightExprs.seasonOf(col("a_date")))
      .withColumn("__wfactor", WeightExprs.weatherFactor(col("wsim")))
      // λ can only be one of the canonical types' values or the default,
      // so the two per-pair pow() calls of the temporal weight collapse to
      // a per-ACCIDENT slot-per-type precompute; the pair loop just
      // indexes it with the route's type index. Same constants, same op
      // order → the picked value is bit-identical to the inline formula.
      // NB: callers that re-derive `__days` per row AFTER enrichment (the
      // date-expanded forecast/warming paths) must re-derive this array
      // from the new column too — `temporalSlots` is the shared builder.
      .withColumn("__tw_arr", temporalSlots(col("__days")))
      .withColumn("__a_coslat", cos(radians(col("a_lat"))))
    accEnriched
  }

  /** One temporal base weight per canonical type (+ the default slot last),
    * as a function of a day-count column — the precompute indexed by
    * `__rt_idx` in [[influenceColumns]].
    */
  def temporalSlots(days: Column): Column = {
    def tw(lam: Double): Column =
      lit(1.0) - lit(WeightExprs.TemporalDecayImpact) *
        (lit(1.0) - pow(pow(lit(lam), days), WeightExprs.TemporalDecayShape))
    array((CanonicalTypes.map(WeightExprs.TemporalLambda) :+
      WeightExprs.TemporalLambdaDefault).map(tw): _*)
  }

  // --- the date-INDEPENDENT factor expressions, shared verbatim by the
  // single-date kernel (influenceColumns) and the multi-date kernel
  // (scoreRoutesForDates, which evaluates them once per pair below the
  // date fan-out) — one definition, so the two paths cannot drift ------

  private def spatialExpr(twoH2: Column): Column =
    exp(-(pow(col("dist_km"), 2)) / twoH2)

  private def elevationExpr: Column = {
    val elevDiff = abs(col("a_elev") - col("elev"))
    when(col("elev").isNull || col("a_elev").isNull, lit(1.0))
      .otherwise(lit(1.0) + lit(WeightExprs.ElevationBonusMax) *
        exp(-pow(elevDiff / col("__elev_c"), 2)))
  }

  private def routeTypeExpr: Column =
    when(col("__rt_idx") >= 0 && col("__acc_idx") >= 0,
      element_at(array(rtMatrixFlat.map(lit): _*),
        (col("__rt_idx") * 7 + col("__acc_idx") + 1).cast("int")))
      .otherwise(WeightExprs.DefaultRouteTypeWeight)

  private def gradeExpr: Column =
    WeightExprs.gradeWeight(col("difficulty"), col("a_difficulty"))

  private val seasonalMultiplier = lit(1.0 +
    (WeightExprs.SeasonalBoost - 1.0) * WeightExprs.TemporalSeasonalImpact)

  /** The per-pair kernel over an already-joined (enriched-routes ×
    * enriched-accidents) frame — shared by the exact cross-join path and
    * the grid-pruned equi-join path (KernelPruning).
    *
    * If the ROUTE side carries a `wmult` column (the A7 extreme-weather
    * multiplier from the route-location bucket's historical stats,
    * `weather_similarity.py:221-344` / batch per-bucket caching in
    * `safety_computation_optimized.py:516-560`), the weather factor is
    * computed per PAIR from the amplified similarity
    * `wsim × wmult` (final_similarity = base × multiplier,
    * `weather_similarity.py:473`) instead of the accident-hoisted factor —
    * exclusion threshold and quadratic power apply to the amplified value.
    */
  def influenceColumns(pairs: DataFrame): DataFrame = {
    val amplified = pairs.columns.contains("wmult")
    // a factor column the caller ALREADY computed is kept, not re-derived
    // — the multi-date kernel (scoreRoutesForDates) evaluates the
    // date-independent factors once per pair BELOW the date fan-out, and
    // re-deriving them here would undo exactly that sharing. Same value
    // either way: the precomputed columns are built from the builders
    // below, so this is reuse, not a second definition.
    def keepOr(name: String, expr: => Column): Column =
      if (pairs.columns.contains(name)) col(name) else expr
    // spatial: exp(-d²/(2h²)) with per-route bandwidth (2h² hoisted)
    val twoH2 =
      if (pairs.columns.contains("__two_h2")) col("__two_h2")
      else lit(2.0) * pow(col("__h"), 2)
    val spatial = spatialExpr(twoH2)
    // temporal: 1 − 0.35·(1 − (λ^days)^1.5), ×1.05 same season — from the
    // per-accident per-type-slot precompute when the enrichment provided it
    val baseWeight =
      if (pairs.columns.contains("__tw_arr"))
        element_at(col("__tw_arr"),
          when(col("__rt_idx") >= 0, col("__rt_idx") + 1)
            .otherwise(CanonicalTypes.size + 1).cast("int")) // default = last slot
      else
        lit(1.0) - lit(WeightExprs.TemporalDecayImpact) *
          (lit(1.0) - pow(pow(col("__lam"), col("__days")), WeightExprs.TemporalDecayShape))
    val temporal = when(col("__same_season"), baseWeight * seasonalMultiplier)
      .otherwise(baseWeight)
    // elevation: bonus-only gaussian with per-route constant
    val elevW = elevationExpr
    // route-type: int-indexed flat 7×7 matrix (same literals as the map form)
    val rtW = routeTypeExpr
    val grW = gradeExpr

    // reuse a dist_km the caller already computed (e.g. the pruned path's
    // per-type radius gate) — identical expression, evaluated once
    val withDist =
      if (pairs.columns.contains("dist_km")) pairs
      else if (pairs.columns.contains("__coslat") && pairs.columns.contains("__a_coslat"))
        pairs.withColumn("dist_km", GeoExprs.haversineKmHoisted(
          col("__coslat"), col("lat"), col("lon"),
          col("__a_coslat"), col("a_lat"), col("a_lon")))
      else pairs.withColumn("dist_km",
        GeoExprs.haversineKm(col("lat"), col("lon"), col("a_lat"), col("a_lon")))
    withDist
      .withColumn("spatial_w", keepOr("spatial_w", spatial))
      .withColumn("temporal_w", temporal)
      .withColumn("elevation_w", keepOr("elevation_w", elevW))
      .withColumn("route_type_w", keepOr("route_type_w", rtW))
      .withColumn("severity_w", col("__sev_w"))
      .withColumn("grade_w", keepOr("grade_w", grW))
      // multiplication order mirrors the reference composition exactly
      // (safety_algorithm.py:293-319) — and the DuckDB oracle SQL.
      .withColumn("base_influence",
        col("spatial_w") * col("temporal_w") * col("elevation_w") *
          col("route_type_w") * col("severity_w") * col("grade_w"))
      .withColumn("weather_factor",
        if (amplified) WeightExprs.weatherFactor(col("wsim") * col("wmult"))
        else col("__wfactor"))
      .withColumn("influence", col("base_influence") * col("weather_factor"))
      .drop("__rt_lc", "__h", "__lam", "__elev_c", "__rt_idx",
        "__sev_w", "__acc_idx", "__days", "__same_season", "__wfactor",
        "__coslat", "__a_coslat", "__tw_arr", "__two_h2")
  }

  /** Aggregate pair influences to per-route risk (A1 + F16).
    *
    * The explicit narrow projection before the groupBy matters at scale:
    * without it the plan keeps the full ~20-column factor frame alive
    * through several Project layers and materializes every pair row
    * (~3.5× slower at 1.16B pairs); with it, Catalyst collapses the kernel
    * into one fused Project producing exactly (route_id, influence).
    */
  def scoreRoutes(pairs: DataFrame): DataFrame =
    pairs
      .select("route_id", "influence")
      .groupBy("route_id")
      .agg(
        sum("influence").as("total_influence"),
        sum(when(col("influence") > SignificanceFloor, 1L).otherwise(0L))
          .as("n_contributing"))
      .withColumn("risk_score", WeightExprs.normalizeRiskScore(col("total_influence")))
      .withColumn("color_code", WeightExprs.colorCode(col("risk_score")))

  /** End-to-end: routes × accidents → per-route risk. */
  def scoreRoutes(routes: DataFrame, accidents: DataFrame, planDate: Column): DataFrame =
    scoreRoutes(pairInfluence(routes, accidents, planDate))

  /** Multi-date accident enrichment for [[scoreRoutesForDates]]: the
    * date-independent scalars exactly as [[enrichAccidents]] hoists them,
    * plus the two date-DEPENDENT temporal inputs as per-date arrays —
    * `__tw_by_date(i)` / `__ss_by_date(i)` are the `__tw_arr` /
    * `__same_season` values [[enrichAccidents]] would compute for
    * `to_date(lit(dates(i)))`, built from the same expressions.
    */
  def enrichAccidentsForDates(accidents: DataFrame, dates: Seq[String]): DataFrame = {
    require(dates.nonEmpty, "enrichAccidentsForDates: empty dates list")
    val accBase =
      if (accidents.columns.contains("wsim")) accidents
      else accidents.withColumn("wsim", lit(NeutralWeatherSimilarity))
    def dayCount(d: String): Column =
      abs(datediff(to_date(lit(d)), col("a_date"))).cast("double")
    accBase
      .withColumn("__sev_w", WeightExprs.severityWeightKernel(col("severity_raw")))
      .withColumn("__acc_idx", typeIdx(lower(col("acc_type"))))
      .withColumn("__wfactor", WeightExprs.weatherFactor(col("wsim")))
      .withColumn("__a_coslat", cos(radians(col("a_lat"))))
      .withColumn("__tw_by_date",
        array(dates.map(d => temporalSlots(dayCount(d))): _*))
      .withColumn("__ss_by_date", array(dates.map(d =>
        WeightExprs.seasonOf(to_date(lit(d))) ===
          WeightExprs.seasonOf(col("a_date"))): _*))
  }

  /** Multi-date scoring with SHARED pair geometry — the nightly batch
    * (ScoringPipeline.computeDailyScores) scores the same routes ×
    * accidents for several plan dates, and only the TEMPORAL factor
    * depends on the date. The per-date form re-ran the whole kernel per
    * date: N × (haversine + spatial/elevation/grade exponentials) for
    * pairs whose geometry never changes. Here ONE broadcast cross join
    * evaluates every date-independent factor once per (route, accident)
    * pair (EvalOnce-pinned so the per-date products reference them as
    * attributes instead of inlining N copies), each date's influence is
    * one product COLUMN over those attributes, the aggregate stays keyed
    * by route alone (N sums per route, not N× the pair rows — the
    * round-17 explode re-keyed the same pair stream through an N×-bigger
    * aggregation input), and the per-date fan-out runs AFTER the
    * aggregate, over |routes| rows.
    *
    * Per-(route, date) results are bit-identical to
    * `scoreRoutes(routes, accidents, to_date(lit(d)))`: the factor
    * expressions are the same definitions (see the builders above),
    * `base_influence` multiplies in the same order (temporal is a fresh
    * per-date value; the date-independent factors are the same doubles),
    * and each (route, date) group accumulates its accidents in the same
    * broadcast-iteration order, from exactly one map partition — pinned
    * by ScoringPipelineSpec's multi-date ≡ per-date arm.
    *
    * Returns the scoreRoutes columns + `prediction_date`.
    */
  def scoreRoutesForDates(routes: DataFrame, accidents: DataFrame,
                          dates: Seq[String]): DataFrame = {
    require(dates.nonEmpty, "scoreRoutesForDates: empty dates list")
    import graft.expr.EvalOnceExpr.evalOnce
    // the shared (date-independent) factors, computed once per pair and
    // EvalOnce-pinned: the per-date influence columns below reference
    // these as attributes, and without the pin CollapseProject would
    // inline each factor's definition into every date's product — the
    // guide-§4.4 duplication, one asin-haversine per date again. The pin
    // is value-transparent (EvalOnce's generated code IS the child's).
    val pairs = enrichRoutes(balance(routes))
      .crossJoin(broadcast(enrichAccidentsForDates(accidents, dates)))
      .withColumn("dist_km", evalOnce(GeoExprs.haversineKmHoisted(
        col("__coslat"), col("lat"), col("lon"),
        col("__a_coslat"), col("a_lat"), col("a_lon"))))
      .withColumn("spatial_w", evalOnce(spatialExpr(col("__two_h2"))))
      .withColumn("elevation_w", evalOnce(elevationExpr))
      .withColumn("route_type_w", evalOnce(routeTypeExpr))
      .withColumn("grade_w", evalOnce(gradeExpr))
    // per-date influence as COLUMNS over the shared factors (round 18):
    // the round-17 form exploded the date index per pair, tripling the
    // aggregation input (3.48B rows at the 168K nightly) to re-key the
    // SAME pair stream; here each date's influence is one more product
    // column, the aggregate stays keyed by route alone over 1.16B rows,
    // and the 3× fan-out happens AFTER the aggregate over 168K rows.
    // Values are bit-identical to the exploded form: same temporal pick
    // (the per-accident per-type slot arrays), same multiplication
    // order (spatial·temporal·elevation·route_type·severity·grade, then
    // ×weather), and each (route, date) sum accumulates its accidents
    // in the same broadcast-iteration order from exactly one map
    // partition — pinned by ScoringPipelineSpec's bitwise arm.
    def influenceFor(i: Int): Column = {
      val baseWeight = element_at(element_at(col("__tw_by_date"), i + 1),
        when(col("__rt_idx") >= 0, col("__rt_idx") + 1)
          .otherwise(CanonicalTypes.size + 1).cast("int"))
      val temporal = when(element_at(col("__ss_by_date"), i + 1),
        baseWeight * seasonalMultiplier).otherwise(baseWeight)
      col("spatial_w") * temporal * col("elevation_w") *
        col("route_type_w") * col("__sev_w") * col("grade_w") * col("__wfactor")
    }
    val narrow = pairs.select(
      col("route_id") +: dates.indices.map(i => influenceFor(i).as(s"__infl_$i")): _*)
    val aggCols = dates.indices.flatMap { i =>
      Seq(sum(col(s"__infl_$i")).as(s"__tot_$i"),
        sum(when(col(s"__infl_$i") > SignificanceFloor, 1L).otherwise(0L))
          .as(s"__n_$i"))
    }
    val dateLit = array(dates.map(d => to_date(lit(d))): _*)
    narrow
      .groupBy("route_id")
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("route_id"), posexplode(array(dates.indices.map(i =>
        struct(col(s"__tot_$i").as("t"), col(s"__n_$i").as("n"))): _*)))
      .select(col("route_id"),
        col("col.t").as("total_influence"), col("col.n").as("n_contributing"),
        col("pos").as("__di"))
      .withColumn("risk_score", WeightExprs.normalizeRiskScore(col("total_influence")))
      .withColumn("color_code", WeightExprs.colorCode(col("risk_score")))
      .withColumn("prediction_date", element_at(dateLit, col("__di") + 1))
      .drop("__di")
  }

  /** Top-k contributing accidents per route (W1) — rank-filter BEFORE any
    * collect so the shuffle carries ≤ k rows per route, never the full
    * pair fan-out (SURVEY §7.4(5)).
    */
  def topContributors(pairs: DataFrame, k: Int = 50): DataFrame = {
    val w = Window.partitionBy("route_id")
      .orderBy(col("influence").desc, col("accident_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
