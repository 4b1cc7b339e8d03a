package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference exact values from backend/app/utils/stats_utils.py and
  * time_utils.py executed on fixture series.
  */
class StatsExprsSpec extends SparkSpec {

  private def arr(xs: Double*): Column = array(xs.map(lit): _*)

  test("within-window weights: reference exact values, sum to 1") {
    val expected = Seq(
      0.08326541005312518, 0.09795930594485316, 0.11524624228806253,
      0.13558381445654416, 0.1595103699488755, 0.18765925876338294,
      0.2207755985451564)
    val got = spark.range(1)
      .select(StatsExprs.withinWindowWeights(lit(7)).as("w"))
      .head().getSeq[Double](0)
    assert(got.size == 7)
    got.zip(expected).foreach { case (a, b) => assert(approx(a, b, 1e-12)) }
    assert(approx(got.sum, 1.0, 1e-12))
    // newest day weighted highest
    assert(got.last == got.max)
  }

  test("weighted pearson: reference fixture values") {
    val w = StatsExprs.withinWindowWeights(lit(7))
    val selfCorr = evalDouble(StatsExprs.weightedPearson(
      arr(15, 16, 17, 18, 19, 18, 17), arr(15, 16, 17, 18, 19, 18, 17), w))
    assert(approx(selfCorr, 1.0, 1e-9))
    val anti = evalDouble(StatsExprs.weightedPearson(
      arr(1, 2, 3, 4, 5, 6, 7), arr(7, 6, 5, 4, 3, 2, 1), w))
    assert(approx(anti, -1.0, 1e-9))
    val bothConst = evalDouble(StatsExprs.weightedPearson(
      arr(5, 5, 5, 5, 5, 5, 5), arr(5, 5, 5, 5, 5, 5, 5), w))
    assert(approx(bothConst, 1.0, 1e-9)) // clamped, like the reference
    val oneConst = evalDouble(StatsExprs.weightedPearson(
      arr(5, 5, 5, 5, 5, 5, 5), arr(1, 2, 3, 4, 5, 6, 7), w))
    assert(approx(oneConst, 0.0, 1e-10)) // reference: -5.7e-17
  }

  test("unweighted pearson edge rules") {
    assert(approx(evalDouble(StatsExprs.pearson(arr(1, 2, 3), arr(2, 4, 6))), 1.0, 1e-9))
    assert(approx(evalDouble(StatsExprs.pearson(arr(1, 2, 3), arr(6, 4, 2))), -1.0, 1e-9))
  }

  test("freeze-thaw counting") {
    def temps(minMax: (Double, Double)*): Column =
      array(minMax.map { case (mn, mx) =>
        struct(lit(mn).as("min"), lit((mn + mx) / 2).as("avg"), lit(mx).as("max"))
      }: _*)
    assert(evalDouble(StatsExprs.freezeThawCount(
      temps(Seq.fill(7)((-5.0, 5.0)): _*)).cast("double")) == 7.0)
    assert(evalDouble(StatsExprs.freezeThawCount(
      temps(Seq.fill(7)((1.0, 9.0)): _*)).cast("double")) == 0.0)
    assert(evalDouble(StatsExprs.freezeThawCount(
      temps((-1.0, 1.0), (0.0, 5.0), (-3.0, 0.0))).cast("double")) == 1.0)
  }

  test("z-score, cyclic month distance, weighted mean/std, temperature conversion") {
    assert(approx(evalDouble(StatsExprs.zScore(lit(12.0), lit(10.0), lit(2.0))), 1.0))
    assert(evalNullable(StatsExprs.zScore(lit(12.0), lit(10.0), lit(0.0))).isEmpty)
    assert(evalDouble(StatsExprs.monthCyclicDistance(lit(1), lit(12)).cast("double")) == 1.0)
    assert(evalDouble(StatsExprs.monthCyclicDistance(lit(3), lit(9)).cast("double")) == 6.0)
    assert(approx(evalDouble(StatsExprs.weightedMean(arr(1, 2, 3), arr(1, 1, 2))), 2.25))
    assert(approx(evalDouble(StatsExprs.weightedStd(arr(5, 5, 5), arr(1, 2, 3))), 0.0))
    assert(approx(evalDouble(StatsExprs.celsiusToFahrenheit(lit(100.0))), 212.0))
    assert(approx(evalDouble(StatsExprs.fahrenheitToCelsius(lit(32.0))), 0.0))
  }
}
