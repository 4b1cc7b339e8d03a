package graft.kernel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PredictSpec extends SparkSpec {

  import spark.implicits._

  private def accidents: DataFrame = Seq(
    (1, 40.3549, -105.6426, Some(4200.0), "alpine", "Serious Injury", "2023-07-15"),
    (2, 41.2549, -105.6426, Some(3500.0), "alpine", "Minor Injury", "2023-07-15"),
    (3, 40.2549, -105.6426, Some(4346.0), "alpine", "Fatal", "2014-07-15"),
    (4, 40.2549, -105.6426, Some(4346.0), "sport", "Minor Injury", "2023-07-15"))
    .toDF("accident_id", "a_lat", "a_lon", "a_elev", "acc_type", "severity_raw", "d")
    .withColumn("a_date", to_date(col("d"))).drop("d")
    .withColumn("a_difficulty", lit(null).cast("double"))

  private val longsPeak = Predict.PredictionRequest(
    40.2549, -105.6426, Some(4346.0), "alpine", "2024-07-15")

  test("predict reproduces the reference fixture end-to-end") {
    val p = Predict.predict(spark, longsPeak, accidents)
    assert(approx(p.riskScore, 3.30406861212714, 1e-9))
    assert(p.colorCode == "green")
    assert(p.numContributing == 4)
    assert(p.topAccidents.map(_.getAs[Int]("accident_id")) == Seq(3, 1, 4, 2))
    // breakdown columns present with sane values
    val top = p.topAccidents.head
    assert(top.getAs[Double]("severity_w") == 1.3)
    assert(top.getAs[Double]("dist_km") == 0.0)
  }

  test("no accidents → zero prediction") {
    val p = Predict.predict(spark, longsPeak, accidents.limit(0))
    assert(p.riskScore == 0.0 && p.numContributing == 0 && p.topAccidents.isEmpty)
  }

  test("grade on the request flows through the parser into the kernel") {
    val withDifficulty = accidents.withColumn("a_difficulty",
      when(col("accident_id") === 1, 15.0)) // far from 5.9 → grade weight < 1
    val without = Predict.predict(spark, longsPeak, withDifficulty)
    val graded = Predict.predict(spark,
      longsPeak.copy(routeGrade = Some("5.9")), withDifficulty)
    assert(graded.riskScore < without.riskScore) // grade mismatch dampens acc 1
  }

  test("forecast: one row per day, dates advance, scores vary smoothly") {
    val f = Predict.forecast(spark, longsPeak, accidents, days = 7).collect()
    assert(f.length == 7)
    val dates = f.map(_.getAs[java.sql.Date]("forecast_date").toString)
    assert(dates.head == "2024-07-15" && dates.last == "2024-07-21")
    val risks = f.map(_.getAs[Double]("risk_score"))
    assert(risks.forall(r => r > 0 && r <= 100))
    // day 0 equals the single predict (same plan date, same kernel)
    assert(approx(risks.head, 3.30406861212714, 1e-9))
  }
}
