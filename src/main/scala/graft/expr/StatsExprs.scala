package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Statistical primitives over array columns, built from Spark higher-order
  * functions (`zip_with` / `aggregate` / `transform`) — per-row array math,
  * no shuffle, no UDF.
  *
  * Reference semantics: `backend/app/utils/stats_utils.py` (weighted Pearson
  * with exact zero-variance edge rules and [-1,1] clamping) and
  * `backend/app/utils/time_utils.py:80-148` (window day-weights,
  * freeze-thaw counting).
  */
object StatsExprs {

  /** Σ xᵢ over a double-array column. */
  def arraySum(x: Column): Column =
    aggregate(x, lit(0.0), (acc, v) => acc + v)

  /** Σ xᵢ·yᵢ (dot product) over two equal-length double arrays. */
  def arrayDot(x: Column, y: Column): Column =
    arraySum(zip_with(x, y, (a, b) => a * b))

  def arrayMean(x: Column): Column = arraySum(x) / size(x)

  /** Exponential within-window day weights, oldest→newest:
    * `w_k = decay^(n-1-k)`, normalized to sum 1
    * (ref: `backend/app/utils/time_utils.py:80-113`; decay=0.85 from
    * `algorithm_config.py:270`).
    */
  val WithinWindowDecay = 0.85

  def withinWindowWeights(numDays: Column, decay: Double = WithinWindowDecay): Column = {
    // greatest(…, 0): numDays = 0 (an empty pattern) must yield a harmless
    // [1.0] instead of the illegal sequence(-1, 0, -1) — downstream
    // validity guards (≥5 days) zero the result anyway, and fixing the
    // shared helper covers every call site
    val raw = transform(sequence(greatest(numDays - 1, lit(0)), lit(0), lit(-1)),
      k => pow(lit(decay), k.cast("double")))
    val total = arraySum(raw)
    transform(raw, w => w / total)
  }

  /** Weighted Pearson correlation of two arrays under a weight array
    * (ref: `backend/app/utils/stats_utils.py:111-170`). Weights are
    * normalized internally. Edge rules reproduced exactly: both sides
    * zero-variance → 1.0; exactly one side → 0.0; result clamped to [-1, 1].
    */
  def weightedPearson(x: Column, y: Column, w: Column): Column = {
    val wSum = arraySum(w)
    val wn = transform(w, wi => wi / wSum)
    val mx = arrayDot(x, wn)
    val my = arrayDot(y, wn)
    val vx = arraySum(zip_with(x, wn, (xi, wi) => wi * (xi - mx) * (xi - mx)))
    val vy = arraySum(zip_with(y, wn, (yi, wi) => wi * (yi - my) * (yi - my)))
    val stdX = sqrt(vx)
    val stdY = sqrt(vy)
    val cov = arraySum(zip_with(zip_with(x, y, (a, b) => (a - mx) * (b - my)), wn,
      (p, wi) => p * wi))
    val corr = cov / (stdX * stdY)
    when(stdX === 0.0 && stdY === 0.0, lit(1.0))
      .when(stdX === 0.0 || stdY === 0.0, lit(0.0))
      .otherwise(least(lit(1.0), greatest(lit(-1.0), corr)))
  }

  /** Unweighted Pearson, population std (ref: `stats_utils.py:51-108`).
    * Edge rules: both constant → 1.0 if equal else 0.0; one constant → 0.0.
    */
  def pearson(x: Column, y: Column): Column = {
    val n = size(x).cast("double")
    val mx = arrayMean(x)
    val my = arrayMean(y)
    val vx = arraySum(transform(x, xi => (xi - mx) * (xi - mx))) / n
    val vy = arraySum(transform(y, yi => (yi - my) * (yi - my))) / n
    val stdX = sqrt(vx)
    val stdY = sqrt(vy)
    val num = arraySum(zip_with(x, y, (a, b) => (a - mx) * (b - my)))
    val corr = num / (n * stdX * stdY)
    when(stdX === 0.0 && stdY === 0.0,
      when(element_at(x, 1) === element_at(y, 1), lit(1.0)).otherwise(lit(0.0)))
      .when(stdX === 0.0 || stdY === 0.0, lit(0.0))
      .otherwise(least(lit(1.0), greatest(lit(-1.0), corr)))
  }

  /** `(v − μ)/σ`, NULL when σ=0 (ref raises; `stats_utils.py:173-197`). */
  def zScore(value: Column, meanVal: Column, stdVal: Column): Column =
    when(stdVal === 0.0, lit(null).cast("double"))
      .otherwise((value - meanVal) / stdVal)

  /** Count of days whose (min, max) straddle 0 °C, over an array of
    * struct{min, max} (ref: `time_utils.py:116-148`).
    */
  def freezeThawCount(dailyTemps: Column): Column =
    size(filter(dailyTemps, t => t.getField("min") < 0.0 && t.getField("max") > 0.0))

  /** Cyclic month distance `min(|a−b|, 12−|a−b|)`
    * (ref: `backend/app/services/weather_service.py:93-96`).
    */
  def monthCyclicDistance(a: Column, b: Column): Column =
    least(abs(a - b), lit(12) - abs(a - b))

  /** Weighted mean Σwv/Σw (ref: `weather_service.py:99-103`). */
  def weightedMean(values: Column, weights: Column): Column =
    arrayDot(values, weights) / arraySum(weights)

  /** Population-style weighted std √(Σw(v−μ)²/Σw)
    * (ref: `weather_service.py:106-110`).
    */
  def weightedStd(values: Column, weights: Column): Column = {
    val mu = weightedMean(values, weights)
    sqrt(arraySum(zip_with(values, weights, (v, w) => w * (v - mu) * (v - mu)))
      / arraySum(weights))
  }

  /** °C → °F (ref: `time_utils.py:151-162`). */
  def celsiusToFahrenheit(c: Column): Column = c * 9.0 / 5.0 + 32.0

  /** °F → °C (ref: `time_utils.py:165-176`). */
  def fahrenheitToCelsius(f: Column): Column = (f - 32.0) * 5.0 / 9.0
}
