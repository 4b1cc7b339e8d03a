package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expr.{GeoExprs, WeightExprs}
import graft.weather.WeatherStats

/** Remaining operator classes from SURVEY §2 expressible over the derived
  * tables: the P6 distance-gated filter, the J8 0.01°-bucket join, the S7
  * rounded-coordinate elevation lookup, and the A6 archive-statistics
  * aggregation (cyclic-month weighted mean/std + monthly volatility).
  */
object OpsQueries {

  /** Deterministic 60-day archive series per supplier key (A6 input). */
  private def archive(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .select(col("s_suppkey"), explode(sequence(lit(0), lit(59))).as("i"))
      .select(
        (col("s_suppkey") % 10).as("bucket"),
        (((col("i") * 7) % 12) + 1).cast("long").as("month"),
        (((col("s_suppkey") * 13 + col("i") * 5) % 60) * 0.5 - 5.0).as("v"))

  private val archiveSql =
    """archive AS (
      |  SELECT s_suppkey % 10 AS bucket,
      |         ((i * 7) % 12) + 1 AS month,
      |         ((s_suppkey * 13 + i * 5) % 60) * 0.5 - 5.0 AS v
      |  FROM supplier, range(60) t(i))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P6: keep accident if close (≤50km) OR strict type match (rtw ≥ 0.85).
    "k11_distance_gate" -> ((s, dir) => {
      val pairs = Derived.routes(s, dir).where(col("route_id") <= 200)
        .crossJoin(broadcast(Derived.accidents(s, dir)))
        .withColumn("dist_km",
          GeoExprs.haversineKm(col("lat"), col("lon"), col("a_lat"), col("a_lon")))
        .withColumn("rtw", WeightExprs.routeTypeWeight(col("route_type"), col("acc_type")))
      pairs
        .groupBy("route_id")
        .agg(
          sum(when(col("dist_km") <= 50.0 || col("rtw") >= 0.85, 1L).otherwise(0L))
            .as("n_kept"),
          count(lit(1)).as("n_total"))
        .orderBy("route_id")
    }),

    // J8: weather dedup by 0.01° bucket — derived key join shape.
    "k12_bucket_join" -> ((s, dir) => {
      Derived.accidents(s, dir)
        .groupBy(
          round(col("a_lat"), 2).as("b_lat"),
          round(col("a_lon"), 2).as("b_lon"))
        .agg(count(lit(1)).as("n_accidents"), min("accident_id").as("first_id"))
        .orderBy("b_lat", "b_lon")
    }),

    // S7: elevation lookup by rounded coords — fill null-elevation routes
    // from the known-elevation routes sharing the rounded grid cell.
    "k13_elev_lookup" -> ((s, dir) => {
      val routes = Derived.routes(s, dir)
      val lookup = routes.where(col("elev").isNotNull)
        .groupBy(
          round(col("lat"), 3).as("g_lat"),
          round(col("lon"), 3).as("g_lon"))
        .agg(min("elev").as("grid_elev"))
      routes.where(col("elev").isNull)
        .join(lookup,
          round(col("lat"), 3) === col("g_lat") &&
            round(col("lon"), 3) === col("g_lon"), "left")
        .select(col("route_id"), coalesce(col("grid_elev"), lit(-1.0)).as("filled_elev"))
        .orderBy("route_id")
    }),

    // A6: cyclic-month-weighted archive statistics per bucket (ref month 7).
    "w05_archive_stats" -> ((s, dir) => {
      WeatherStats.bucketStats(archive(s, dir), "v", refMonth = 7)
        .select(
          col("bucket"), col("n_samples"),
          round(col("w_mean"), 6).as("w_mean"),
          round(col("w_std"), 6).as("w_std"),
          col("valid"))
        .orderBy("bucket")
    }),

    // A6 volatility groups: per (bucket, month) mean/std/count.
    "w06_monthly_volatility" -> ((s, dir) => {
      WeatherStats.monthlyVolatility(archive(s, dir), "v")
        .select(
          col("bucket"), col("month"),
          round(col("m_mean"), 6).as("m_mean"),
          round(col("m_std"), 6).as("m_std"),
          col("n"))
        .orderBy("bucket", "month")
    }))

  val oracles: Map[String, String] = Map(
    "k11_distance_gate" -> {
      val dist = Sql.haversine("lat", "lon", "a_lat", "a_lon")
      val rtw = Sql.routeTypeWeight("route_type", "acc_type")
      s"""WITH ${Sql.RoutesCte},
         |${Sql.AccidentsCte}
         |SELECT route_id,
         |       CAST(count(*) FILTER (WHERE ($dist) <= 50.0 OR ($rtw) >= 0.85) AS BIGINT)
         |         AS n_kept,
         |       count(*) AS n_total
         |FROM routes CROSS JOIN accidents
         |WHERE route_id <= 200
         |GROUP BY route_id
         |ORDER BY route_id""".stripMargin
    },

    "k12_bucket_join" ->
      s"""WITH ${Sql.AccidentsCte.replace("accidents AS", "accidents AS")}
         |SELECT round(a_lat, 2) AS b_lat, round(a_lon, 2) AS b_lon,
         |       count(*) AS n_accidents, min(accident_id) AS first_id
         |FROM accidents
         |GROUP BY 1, 2
         |ORDER BY b_lat, b_lon""".stripMargin,

    "k13_elev_lookup" ->
      s"""WITH ${Sql.RoutesCte},
         |lookup AS (
         |  SELECT round(lat, 3) AS g_lat, round(lon, 3) AS g_lon, min(elev) AS grid_elev
         |  FROM routes WHERE elev IS NOT NULL
         |  GROUP BY 1, 2)
         |SELECT route_id, coalesce(grid_elev, -1.0) AS filled_elev
         |FROM routes LEFT JOIN lookup
         |  ON round(lat, 3) = g_lat AND round(lon, 3) = g_lon
         |WHERE elev IS NULL
         |ORDER BY route_id""".stripMargin,

    "w05_archive_stats" -> {
      val w = s"exp(-CAST(least(abs(month - 7), 12 - abs(month - 7)) AS DOUBLE) / ${WeatherStats.MonthDecayScale})"
      s"""WITH $archiveSql,
         |agged AS (
         |  SELECT bucket, count(*) AS n_samples,
         |         sum(($w) * v) / sum($w) AS w_mean,
         |         sum($w) AS w_sum,
         |         sum(($w) * v * v) AS w_sq
         |  FROM archive GROUP BY bucket)
         |SELECT bucket, n_samples,
         |       round(w_mean, 6) AS w_mean,
         |       round(sqrt(greatest(w_sq / w_sum - w_mean * w_mean, 0.0)), 6) AS w_std,
         |       n_samples >= ${WeatherStats.MinSamples} AS valid
         |FROM agged
         |ORDER BY bucket""".stripMargin
    },

    "w06_monthly_volatility" ->
      s"""WITH $archiveSql
         |SELECT bucket, month,
         |       round(avg(v), 6) AS m_mean,
         |       round(stddev_pop(v), 6) AS m_std,
         |       count(*) AS n
         |FROM archive
         |GROUP BY bucket, month
         |ORDER BY bucket, month""".stripMargin)
}
