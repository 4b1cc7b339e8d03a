package graft.weather

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expr.StatsExprs

/** 7-day weather-pattern similarity (SURVEY A3-A5, A7) as pure column
  * arithmetic over array columns — per-row math, no shuffle, no UDF.
  *
  * A pattern is a struct column with fields:
  *   temperature, precipitation, wind_speed, visibility, cloud_cover
  *     — each ArrayType(DoubleType), oldest day first —
  *   daily_temps — ArrayType(StructType(min, avg, max))
  *
  * Reference: `backend/app/services/weather_similarity.py:88-218`, factor
  * weights `algorithm_config.py:164-171` (equal 1/6), validity ≥5 of 7 days
  * (`algorithm_config.py:270`).
  */
object WeatherExprs {

  val MinWeatherDaysRequired = 5
  val FactorWeight: Double = 1.0 / 6

  /** Struct-typed pattern builder (fields in canonical order). */
  def pattern(temperature: Column, precipitation: Column, windSpeed: Column,
              visibility: Column, cloudCover: Column, dailyTemps: Column): Column =
    struct(
      temperature.as("temperature"), precipitation.as("precipitation"),
      windSpeed.as("wind_speed"), visibility.as("visibility"),
      cloudCover.as("cloud_cover"), dailyTemps.as("daily_temps"))

  /** `(corr + 1) / 2` — Pearson [-1,1] → [0,1] (`weather_similarity.py:146`). */
  def factorScore(corr: Column): Column = (corr + lit(1.0)) / 2

  /** Freeze-thaw closeness: `max(0, 1 − |Δft| / (max(ft_a, ft_b, 1) + 7))`
    * (`weather_similarity.py:196-203`).
    */
  def freezeThawSimilarity(ftA: Column, ftB: Column): Column =
    greatest(lit(0.0),
      lit(1.0) - abs(ftA - ftB) / (greatest(ftA, ftB, lit(1)) + lit(7)))

  /** Base 6-factor similarity (no extreme-weather amplification).
    * Invalid pattern on either side (< 5 days) → 0.0
    * (`weather_similarity.py:124-126`).
    */
  def weatherSimilarity(current: Column, accident: Column): Column = {
    val nDays = least(size(current.getField("temperature")),
      size(accident.getField("temperature")))
    val weights = StatsExprs.withinWindowWeights(nDays)

    def corrScore(field: String): Column =
      factorScore(StatsExprs.weightedPearson(
        slice(current.getField(field), lit(1), nDays),
        slice(accident.getField(field), lit(1), nDays), weights))

    val ftA = StatsExprs.freezeThawCount(current.getField("daily_temps"))
    val ftB = StatsExprs.freezeThawCount(accident.getField("daily_temps"))

    // canonical factor order mirrors the reference dict iteration order
    val scores = Seq(
      corrScore("temperature"), corrScore("precipitation"),
      corrScore("wind_speed"), corrScore("visibility"),
      corrScore("cloud_cover"), freezeThawSimilarity(ftA, ftB))
    val base = scores.map(_ * lit(FactorWeight)).reduce(_ + _)

    when(size(current.getField("temperature")) < MinWeatherDaysRequired ||
      size(accident.getField("temperature")) < MinWeatherDaysRequired, lit(0.0))
      .otherwise(base)
  }

  val ExtremeSdThreshold = 2.0
  /** Per-factor penalty per SD beyond threshold (`algorithm_config.py:177-182`). */
  val ExtremePenalty: Map[String, Double] = Map(
    "wind_speed" -> 0.20, "precipitation" -> 0.20,
    "temperature" -> 0.20, "visibility" -> 0.25)

  /** Extreme-weather multiplier (A7): 1 + Σ_factors (|z| − 2)·penalty for
    * factors whose current-window mean is > 2 SD from the historical mean
    * (`weather_similarity.py:230-344`). `stats` is a struct with fields
    * `<factor>_mean` / `<factor>_std`; zero/null std → factor skipped.
    */
  def extremeMultiplier(current: Column, stats: Column): Column = {
    val terms = Seq("wind_speed", "precipitation", "temperature", "visibility").map { f =>
      val cur = StatsExprs.arrayMean(current.getField(f))
      val mu = stats.getField(s"${f}_mean")
      val sd = stats.getField(s"${f}_std")
      val z = abs((cur - mu) / sd)
      when(sd.isNull || sd === 0.0, lit(0.0))
        .otherwise(when(z > ExtremeSdThreshold,
          (z - ExtremeSdThreshold) * ExtremePenalty(f)).otherwise(lit(0.0)))
    }
    lit(1.0) + terms.reduce(_ + _)
  }

  /** Full similarity with optional amplification. */
  def weatherSimilarity(current: Column, accident: Column, stats: Column): Column =
    weatherSimilarity(current, accident) * extremeMultiplier(current, stats)

  /** Staged (let-bound) twin of [[weatherSimilarity]] for bulk use: every
    * shared subexpression (patterns, weights, per-factor moments) becomes a
    * materialized column in its own projection, so the expression DAG is
    * evaluated once per value instead of exponentially re-expanded — the
    * single-Column form duplicates the weight-normalization subtree ~5× per
    * factor and the moment subtrees on top of that, which is what made the
    * naive form O(seconds) per thousand rows. Arithmetic and operation
    * order are identical, so results match the Column form bit-for-bit.
    */
  def withWeatherSimilarity(df: org.apache.spark.sql.DataFrame, current: Column,
                            accident: Column, out: String): org.apache.spark.sql.DataFrame =
    withWeatherSimilarityStaged(df, current, accident, out, detailPrefix = None)

  /** Detailed twin of the reference's
    * `calculate_weather_similarity_detailed` (`weather_similarity.py:347-483`):
    * alongside `out`, emits per-factor scores and diagnostics under
    * `prefix`: `<prefix>score_{temperature,precipitation,wind_speed,
    * visibility,cloud_cover,freeze_thaw}`, `<prefix>ft_current`,
    * `<prefix>ft_accident`, `<prefix>days_compared`. Shares the staged core
    * with [[withWeatherSimilarity]], so the composite is the weighted sum
    * of the emitted factors bit-for-bit. Divergence from the reference's
    * dict shape: an INVALID pattern (< 5 days) yields all-zero scores and
    * counts (the relational spelling of its empty-dict-and-zeros return).
    */
  def withWeatherSimilarityDetailed(df: org.apache.spark.sql.DataFrame, current: Column,
                                    accident: Column, out: String,
                                    prefix: String = "ws_"): org.apache.spark.sql.DataFrame =
    withWeatherSimilarityStaged(df, current, accident, out, detailPrefix = Some(prefix))

  private def withWeatherSimilarityStaged(df: org.apache.spark.sql.DataFrame, current: Column,
                                          accident: Column, out: String,
                                          detailPrefix: Option[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.DataFrame
    val factors = Seq("temperature", "precipitation", "wind_speed", "visibility", "cloud_cover")

    var d: DataFrame = df
      .withColumn("_cur", current)
      .withColumn("_acc", accident)
    d = d.withColumn("_n",
      least(size(col("_cur.temperature")), size(col("_acc.temperature"))))
    // withinWindowWeights(n): raw = pow(decay, n-1-k); normalized by its
    // sum. greatest(…, 0): an EMPTY pattern (_n = 0, e.g. a no-rows
    // Forecast bucket) must flow through to the final <5-day guard as 0.0,
    // not crash on sequence(-1, 0, -1) — the Column-form twin survives the
    // same input only because its CaseWhen evaluates weights lazily.
    d = d.withColumn("_wraw",
      transform(sequence(greatest(col("_n") - 1, lit(0)), lit(0), lit(-1)),
        k => pow(lit(StatsExprs.WithinWindowDecay), k.cast("double"))))
    d = d.withColumn("_wsum1", StatsExprs.arraySum(col("_wraw")))
    d = d.withColumn("_w1", transform(col("_wraw"), w => w / col("_wsum1")))
    // weightedPearson internally renormalizes its weights — mirror that
    d = d.withColumn("_wsum2", StatsExprs.arraySum(col("_w1")))
    d = d.withColumn("_wn", transform(col("_w1"), w => w / col("_wsum2")))

    for (f <- factors) {
      d = d.withColumn(s"_x_$f", slice(col(s"_cur.$f"), lit(1), col("_n")))
        .withColumn(s"_y_$f", slice(col(s"_acc.$f"), lit(1), col("_n")))
      d = d.withColumn(s"_mx_$f", StatsExprs.arrayDot(col(s"_x_$f"), col("_wn")))
        .withColumn(s"_my_$f", StatsExprs.arrayDot(col(s"_y_$f"), col("_wn")))
      d = d.withColumn(s"_vx_$f",
        StatsExprs.arraySum(zip_with(col(s"_x_$f"), col("_wn"),
          (xi, wi) => wi * (xi - col(s"_mx_$f")) * (xi - col(s"_mx_$f")))))
        .withColumn(s"_vy_$f",
          StatsExprs.arraySum(zip_with(col(s"_y_$f"), col("_wn"),
            (yi, wi) => wi * (yi - col(s"_my_$f")) * (yi - col(s"_my_$f")))))
        .withColumn(s"_cov_$f",
          StatsExprs.arraySum(zip_with(
            zip_with(col(s"_x_$f"), col(s"_y_$f"),
              (a, b) => (a - col(s"_mx_$f")) * (b - col(s"_my_$f"))),
            col("_wn"), (p, wi) => p * wi)))
      val stdX = sqrt(col(s"_vx_$f"))
      val stdY = sqrt(col(s"_vy_$f"))
      val corr = col(s"_cov_$f") / (stdX * stdY)
      val pearson = when(stdX === 0.0 && stdY === 0.0, lit(1.0))
        .when(stdX === 0.0 || stdY === 0.0, lit(0.0))
        .otherwise(least(lit(1.0), greatest(lit(-1.0), corr)))
      d = d.withColumn(s"_score_$f", factorScore(pearson))
    }

    d = d.withColumn("_ft_a", StatsExprs.freezeThawCount(col("_cur.daily_temps")))
      .withColumn("_ft_b", StatsExprs.freezeThawCount(col("_acc.daily_temps")))
    val ftScore = freezeThawSimilarity(col("_ft_a"), col("_ft_b"))
    val scores = factors.map(f => col(s"_score_$f")) :+ ftScore
    val base = scores.map(_ * lit(FactorWeight)).reduce(_ + _)
    val invalid = size(col("_cur.temperature")) < MinWeatherDaysRequired ||
      size(col("_acc.temperature")) < MinWeatherDaysRequired
    d = d.withColumn(out, when(invalid, lit(0.0)).otherwise(base))
    detailPrefix.foreach { p =>
      for (f <- factors)
        d = d.withColumn(s"${p}score_$f",
          when(invalid, 0.0).otherwise(col(s"_score_$f")))
      d = d.withColumn(s"${p}score_freeze_thaw", when(invalid, 0.0).otherwise(ftScore))
        .withColumn(s"${p}ft_current",
          when(invalid, 0L).otherwise(col("_ft_a").cast("long")))
        .withColumn(s"${p}ft_accident",
          when(invalid, 0L).otherwise(col("_ft_b").cast("long")))
        .withColumn(s"${p}days_compared",
          when(invalid, 0L).otherwise(col("_n").cast("long")))
    }

    val tmpCols = Seq("_cur", "_acc", "_n", "_wraw", "_wsum1", "_w1", "_wsum2", "_wn",
      "_ft_a", "_ft_b") ++
      factors.flatMap(f => Seq(s"_x_$f", s"_y_$f", s"_mx_$f", s"_my_$f",
        s"_vx_$f", s"_vy_$f", s"_cov_$f", s"_score_$f"))
    d.drop(tmpCols: _*)
  }
}
