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

  /** Per-(route × accident) influence decomposition over a broadcast cross
    * join. Returns the pair grain with every factor as its own column —
    * downstream ops (risk agg, top-k breakdown, factor-contribution
    * analytics A13) all derive from this one plan.
    */
  def pairInfluence(routes: DataFrame, accidents: DataFrame, planDate: Column): DataFrame = {
    val acc =
      if (accidents.columns.contains("wsim")) accidents
      else accidents.withColumn("wsim", lit(NeutralWeatherSimilarity))
    val pairs = routes.crossJoin(broadcast(acc))

    val dist = GeoExprs.haversineKm(col("lat"), col("lon"), col("a_lat"), col("a_lon"))
    val spatial = WeightExprs.spatialWeight(col("dist_km"), col("route_type"))
    val temporal = WeightExprs.temporalWeight(planDate, col("a_date"), col("route_type"))
    val elevW = WeightExprs.elevationWeight(col("elev"), col("a_elev"), col("route_type"))
    val rtW = WeightExprs.routeTypeWeight(col("route_type"), col("acc_type"))
    // NB: raw lookup, not normalize-then-weight — mirrors the reference
    // kernel exactly (see WeightExprs.severityWeightKernel scaladoc).
    val sevW = WeightExprs.severityWeightKernel(col("severity_raw"))
    val grW = WeightExprs.gradeWeight(col("difficulty"), col("a_difficulty"))

    pairs
      .withColumn("dist_km", dist)
      .withColumn("spatial_w", spatial)
      .withColumn("temporal_w", temporal)
      .withColumn("elevation_w", elevW)
      .withColumn("route_type_w", rtW)
      .withColumn("severity_w", sevW)
      .withColumn("grade_w", grW)
      // multiplication order mirrors the reference composition exactly
      // (safety_algorithm.py:293-319) — and the DuckDB oracle SQL.
      .withColumn("base_influence",
        col("spatial_w") * col("temporal_w") * col("elevation_w") *
          col("route_type_w") * col("severity_w") * col("grade_w"))
      .withColumn("weather_factor", WeightExprs.weatherFactor(col("wsim")))
      .withColumn("influence", col("base_influence") * col("weather_factor"))
  }

  /** Aggregate pair influences to per-route risk (A1 + F16). */
  def scoreRoutes(pairs: DataFrame): DataFrame =
    pairs
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
