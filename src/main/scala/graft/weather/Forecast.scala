package graft.weather

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hermetic twin of the reference's forecast service (S5): builds the
  * CURRENT 7-day weather pattern from a `current_weather` input table
  * (FIXTURES.md §5) instead of the Open-Meteo HTTP call
  * (`backend/app/services/weather_service.py:171-288`).
  *
  * Faithful details: window is `target-6 … target`; the series are used
  * VERBATIM (no per-field defaults — unlike accident-row assembly); the
  * API provides no visibility, so the visibility series is the constant
  * 10000.0 (`weather_service.py:253-254`); daily temps come from the
  * min/mean/max columns directly. A fetch miss (no rows for the bucket,
  * or <5 days) maps to "no current pattern" → callers fall back to the
  * neutral-0.5 path, mirroring the service returning None.
  */
object Forecast {

  /** Single source of truth is the assembly side — a desynchronized copy
    * here would feed the similarity kernel mismatched visibility series.
    */
  val VisibilityDefaultM: Double = WeatherAssembly.VisibilityDefaultM

  /** 0.01°-rounded bucket key (`weather_service.py` cache-key rounding /
    * FIXTURES.md §5 keying). `bround` = HALF_EVEN, matching Python's
    * `round()` on exact .xx5 coordinates — `round` (HALF_UP) would probe a
    * different bucket than a reference-keyed fixture on those boundaries.
    */
  def bucketOf(coord: Column): Column = bround(coord, 2)

  /** One-row frame `(cur_pattern, cur_days)` for the bucket of (lat, lon)
    * with the 7-day window ending at `targetDate`. Zero rows in the window
    * still yield one row with `cur_days = 0` (empty arrays) so callers can
    * branch without a driver round-trip.
    */
  def currentPattern(currentWeather: DataFrame, lat: Double, lon: Double,
                     targetDate: Column): DataFrame = {
    val recs = col("recs")
    def series(f: String): Column = transform(recs, r => r.getField(f))
    currentWeather
      .where(col("lat_bucket") === bucketOf(lit(lat)) &&
        col("lon_bucket") === bucketOf(lit(lon)) &&
        col("date") >= date_sub(targetDate, WeatherAssembly.WindowDays) &&
        col("date") <= targetDate)
      .agg(sort_array(collect_list(struct(
        col("date"), col("temperature_mean"), col("temperature_min"),
        col("temperature_max"), col("precipitation_sum"),
        col("wind_speed_max"), col("cloud_cover_mean")))).as("recs"))
      .select(
        WeatherExprs.pattern(
          series("temperature_mean"),
          series("precipitation_sum"),
          series("wind_speed_max"),
          transform(recs, _ => lit(VisibilityDefaultM)),
          series("cloud_cover_mean"),
          transform(recs, r => struct(
            r.getField("temperature_min").as("min"),
            r.getField("temperature_mean").as("avg"),
            r.getField("temperature_max").as("max")))).as("cur_pattern"),
        size(recs).as("cur_days"))
  }
}
