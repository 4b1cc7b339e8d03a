package graft.weather

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.StatsExprs

/** Historical weather statistics (SURVEY A6): per-location-bucket factor
  * mean/std under cyclic-month exponential weighting, plus per-month
  * volatility groups — the inputs of the extreme-weather multiplier (A7).
  *
  * Reference: `backend/app/services/weather_service.py:93-110,353-471` —
  * weight = exp(−monthCyclicDistance(month, refMonth)/2.0), weighted
  * population-style mean/std, per-month mean/std/count with a ≥30-sample
  * validity threshold.
  *
  * Spark shape: two hash aggregations over the archive scan (partial
  * map-side combine); the result is a small per-bucket frame meant to be
  * broadcast back into the kernel.
  */
object WeatherStats {

  val MonthDecayScale = 2.0
  val MinSamples = 30

  def monthWeight(month: Column, refMonth: Column): Column =
    exp(-StatsExprs.monthCyclicDistance(month, refMonth).cast("double") / MonthDecayScale)

  /** Per-bucket weighted mean/std of a value column for a reference month.
    * Input needs (`bucket`, `month`, valueCol).
    */
  def bucketStats(archive: DataFrame, valueCol: String, refMonth: Int): DataFrame = {
    val w = monthWeight(col("month"), lit(refMonth))
    val v = col(valueCol)
    // per-SAMPLE accounting (weather_service.py:437-442 builds each
    // factor's series from its non-null rows): the weight denominator and
    // the validity count must skip null-v rows — counting them would bias
    // the mean toward 0 and grant validity a bucket's data can't support
    archive.groupBy("bucket")
      .agg(
        count(v).as("n_samples"),
        (sum(w * v) / sum(when(v.isNotNull, w))).as("w_mean"),
        sum(when(v.isNotNull, w)).as("w_sum"),
        sum(w * v * v).as("w_sq"))
      // population-style weighted std: sqrt(E_w[v²] − E_w[v]²)
      .withColumn("w_std", sqrt(greatest(col("w_sq") / col("w_sum") -
        col("w_mean") * col("w_mean"), lit(0.0))))
      .withColumn("valid", col("n_samples") >= MinSamples)
      .drop("w_sum", "w_sq")
  }

  /** Single-pass per-bucket weighted mean/std for SEVERAL factor columns
    * at once — the shape `weather_service.get_historical_stats`
    * (`weather_service.py:386-471`) hands the extreme-weather multiplier:
    * per factor `(mean, std)`, with a factor dropped (std → NULL here)
    * when its bucket has fewer than [[MinSamples]] samples
    * (`weather_service.py:437-442`). One hash aggregation, map-side
    * partial, factor count × 3 running sums per bucket.
    */
  def bucketFactorStats(archive: DataFrame, factorCols: Seq[String],
                        refMonth: Int): DataFrame = {
    val w = monthWeight(col("month"), lit(refMonth))
    // per-factor null-aware sums (see bucketStats): each factor carries its
    // own weight denominator and sample count, like the reference's
    // per-factor series
    val aggs = factorCols.flatMap { f =>
      Seq(sum(w * col(f)).as(s"__s_$f"), sum(w * col(f) * col(f)).as(s"__s2_$f"),
        sum(when(col(f).isNotNull, w)).as(s"__sw_$f"), count(col(f)).as(s"__n_$f"))
    }
    // `n_rows`, NOT `n_samples`: this frame's row count is a bucket-level
    // diagnostic; validity is PER FACTOR (each factor's own non-null count
    // gates its std below). bucketStats's `n_samples` counts non-null
    // values of its single factor — reusing that name here for count(*)
    // invited applying the ≥MinSamples rule to the wrong quantity.
    factorCols.foldLeft(
      archive.groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
    ) { (df, f) =>
      val mean = col(s"__s_$f") / col(s"__sw_$f")
      val std = sqrt(greatest(col(s"__s2_$f") / col(s"__sw_$f") - mean * mean, lit(0.0)))
      df.withColumn(s"${f}_mean", mean)
        .withColumn(s"${f}_std",
          when(col(s"__n_$f") >= MinSamples, std).otherwise(lit(null).cast("double")))
    }.drop(factorCols.flatMap(f =>
      Seq(s"__s_$f", s"__s2_$f", s"__sw_$f", s"__n_$f")): _*)
  }

  /** Per-(bucket, month) volatility groups: plain mean/std/count. */
  def monthlyVolatility(archive: DataFrame, valueCol: String): DataFrame =
    archive.groupBy("bucket", "month")
      .agg(
        avg(valueCol).as("m_mean"),
        stddev_pop(valueCol).as("m_std"),
        count(lit(1)).as("n"))
}
