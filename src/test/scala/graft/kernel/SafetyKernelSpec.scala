package graft.kernel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end kernel fidelity on the reference's own canonical fixture
  * (test_safety_algorithm.py:30-120: Longs Peak + 4 accidents, no weather →
  * neutral 0.5). Expected risk/influences produced by executing the
  * reference calculate_safety_score on the identical inputs.
  */
class SafetyKernelSpec extends SparkSpec {

  import spark.implicits._

  private def longsPeak: DataFrame = Seq(
    (100L, 40.2549, -105.6426, Some(4346.0), "alpine", Option.empty[Double]))
    .toDF("route_id", "lat", "lon", "elev", "route_type", "difficulty")

  private def accidents: DataFrame = Seq(
    (1, 40.3549, -105.6426, Some(4200.0), "alpine", "Serious Injury", "2023-07-15"),
    (2, 41.2549, -105.6426, Some(3500.0), "alpine", "Minor Injury", "2023-07-15"),
    (3, 40.2549, -105.6426, Some(4346.0), "alpine", "Fatal", "2014-07-15"),
    (4, 40.2549, -105.6426, Some(4346.0), "sport", "Minor Injury", "2023-07-15"))
    .toDF("accident_id", "a_lat", "a_lon", "a_elev", "acc_type", "severity_raw", "d")
    .withColumn("a_date", to_date(col("d"))).drop("d")
    .withColumn("a_difficulty", lit(null).cast("double"))

  private val planDate = to_date(lit("2024-07-15"))

  test("risk score matches reference exactly: 3.30406861212714") {
    val res = SafetyKernel.scoreRoutes(longsPeak, accidents, planDate).head()
    val risk = res.getAs[Double]("risk_score")
    assert(approx(risk, 3.30406861212714, 1e-9), s"got $risk")
    assert(res.getAs[Long]("n_contributing") == 4)
    assert(res.getAs[String]("color_code") == "green")
  }

  test("per-accident influences match reference breakdown") {
    val pairs = SafetyKernel.pairInfluence(longsPeak, accidents, planDate)
      .select("accident_id", "influence", "spatial_w", "temporal_w",
        "elevation_w", "route_type_w", "severity_w", "grade_w")
      .collect().map(r => r.getAs[Int]("accident_id") -> r).toMap
    // reference rounded breakdown: id → (influence, severity_w)
    assert(approx(pairs(3).getAs[Double]("influence"), 0.1505, 5e-5))
    assert(approx(pairs(1).getAs[Double]("influence"), 0.1437, 5e-5))
    assert(approx(pairs(4).getAs[Double]("influence"), 0.1309, 5e-5))
    assert(approx(pairs(2).getAs[Double]("influence"), 0.0469, 5e-5))
    // "Fatal" hits the raw lookup; "Serious Injury" does NOT (kernel quirk)
    assert(pairs(3).getAs[Double]("severity_w") == 1.3)
    assert(pairs(1).getAs[Double]("severity_w") == 1.0)
    // canary: sport accident at alpine plan → 0.9
    assert(pairs(4).getAs[Double]("route_type_w") == 0.9)
  }

  test("top contributors ranked by influence desc: 3, 1, 4, 2") {
    val pairs = SafetyKernel.pairInfluence(longsPeak, accidents, planDate)
    val top = SafetyKernel.topContributors(pairs, 3)
      .orderBy("rank").select("accident_id").as[Int].collect()
    assert(top.toSeq == Seq(3, 1, 4))
  }

  test("no accidents → zero risk") {
    val res = SafetyKernel.scoreRoutes(longsPeak, accidents.limit(0), planDate)
    assert(res.count() == 0) // empty group-by: no row; serving layer coalesces to 0
  }

  test("known-outcomes invariant: nearby fatal cluster outranks distant minor") {
    // two synthetic locations scored against the same accidents: the one at
    // the accident cluster must score strictly higher (reference
    // test_known_outcomes_validation.py approach)
    val routes = Seq(
      (1L, 40.2549, -105.6426, Some(4346.0), "alpine", Option.empty[Double]), // at cluster
      (2L, 25.0, -80.0, Some(10.0), "alpine", Option.empty[Double])) // Florida
      .toDF("route_id", "lat", "lon", "elev", "route_type", "difficulty")
    val scored = SafetyKernel.scoreRoutes(routes, accidents, planDate)
      .select("route_id", "risk_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > scored(2L))
    assert(scored(2L) < 0.001) // ~2000 km away → negligible influence
  }

  test("weather similarity column gates influence (threshold 0.25, cubic)") {
    val withWsim = accidents.withColumn("wsim",
      when(col("accident_id") === 1, 0.9)
        .when(col("accident_id") === 2, 0.2) // below threshold → zeroed
        .otherwise(0.5))
    val pairs = SafetyKernel.pairInfluence(longsPeak, withWsim, planDate)
      .select("accident_id", "weather_factor").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(approx(pairs(1), math.pow(0.9, 3), 1e-12))
    assert(pairs(2) == 0.0)
    assert(approx(pairs(3), 0.125, 1e-12))
  }
}
