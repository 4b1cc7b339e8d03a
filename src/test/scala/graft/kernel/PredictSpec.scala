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

  test("P6 gate: distant incompatible accidents are excluded, local kept") {
    // a distant (>50km) boulder accident vs an alpine request: rtw
    // (alpine, boulder) < 0.85 → gated out; same accident nearby → kept
    val distantBoulder = accidents.unionByName(
      Seq((9, 42.2549, -105.6426, Option.empty[Double], "boulder", "Serious Injury",
        "2023-07-15"))
        .toDF("accident_id", "a_lat", "a_lon", "a_elev", "acc_type", "severity_raw", "d")
        .withColumn("a_date", to_date(col("d"))).drop("d")
        .withColumn("a_difficulty", lit(null).cast("double")))
    val gated = Predict.gateAccidents(longsPeak, distantBoulder)
      .select("accident_id").collect().map(_.getInt(0)).toSet
    assert(gated == Set(1, 2, 3, 4)) // 9 dropped: distant + incompatible
    // the exact fixture is unchanged by the gate (all four pass it)
    val p = Predict.predict(spark, longsPeak, distantBoulder)
    assert(approx(p.riskScore, 3.30406861212714, 1e-9))
  }

  test("elevation auto-resolution from the S7 rounded-coord lookup") {
    val elev = Seq((40.255, -105.643, 4346.0), (40.0, -105.0, 1500.0))
      .toDF("g_lat", "g_lon", "elevation_m")
    val resolved = Predict.resolveElevation(longsPeak.copy(elevation = None), elev)
    assert(resolved.elevation.contains(4346.0))
    // provided elevation wins; grid miss stays empty
    assert(Predict.resolveElevation(longsPeak, elev).elevation.contains(4346.0))
    val miss = Predict.resolveElevation(
      longsPeak.copy(latitude = 10.0, longitude = 10.0, elevation = None), elev)
    assert(miss.elevation.isEmpty)
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

  test("predictWithWeather: end-to-end S5 — real weather replaces neutral 0.5") {
    import java.sql.Date
    import java.time.LocalDate
    import graft.weather.WeatherAssemblySpec.W

    // current_weather rows for the Longs Peak bucket (40.25, -105.64),
    // 7 days ending at the planned date (FIXTURES.md §8 forecast series)
    val temps = Seq(15.0, 16.0, 17.0, 18.0, 19.0, 18.0, 17.0)
    val prec = Seq(0.0, 0.0, 2.0, 1.0, 0.0, 0.0, 0.0)
    val wind = Seq(5.0, 6.0, 7.0, 8.0, 6.0, 5.0, 4.0)
    val cloud = Seq(20.0, 30.0, 60.0, 50.0, 30.0, 20.0, 10.0)
    val cw = (0 to 6).map { k =>
      (40.25, -105.64, Date.valueOf(LocalDate.parse("2024-07-09").plusDays(k)),
        temps(k), temps(k) - 5.0, temps(k) + 5.0, prec(k), wind(k), cloud(k))
    }.toDF("lat_bucket", "lon_bucket", "date", "temperature_mean",
      "temperature_min", "temperature_max", "precipitation_sum",
      "wind_speed_max", "cloud_cover_mean")

    // weather ROWS: accidents 1/3/4 get full 7-day coverage, accident 2
    // only 3 days (→ invalid pattern → neutral 0.5)
    val aDates = Map(1 -> "2023-07-15", 2 -> "2023-07-15",
      3 -> "2014-07-15", 4 -> "2023-07-15")
    val wrows = (for {
      (a, d) <- aDates.toSeq
      k <- 0 to 6
      if a != 2 || k >= 4
    } yield W(a, Date.valueOf(LocalDate.parse(d).minusDays(6 - k)),
      Some(10.0 + a + k), Some(5.0 + k), Some(20.0 + k),
      Some(if ((a + k) % 3 == 0) 1.5 else 0.0), Some(4.0 + (a + k) % 5),
      Some(9000.0), Some(10.0 * ((a + k) % 8)))).toDF()

    val pNeutral = Predict.predict(spark, longsPeak, accidents)
    val pWeather = Predict.predictWithWeather(spark, longsPeak, accidents, wrows, cw)
    assert(pWeather.riskScore !== pNeutral.riskScore)
    assert(pWeather.riskScore > 0 && pWeather.riskScore <= 100)

    // bucket miss → service-None path → identical to the neutral predict
    val pMiss = Predict.predictWithWeather(spark, longsPeak, accidents, wrows,
      cw.where(col("lat_bucket") === 0.0))
    assert(pMiss.riskScore == pNeutral.riskScore)

    // A7 amplification: wind stats far from the current mean with tiny σ
    // → multiplier > 1 → amplified similarity → higher risk
    val stats = Seq((2.0, 1.0, 0.0, 0.0, 0.0, 0.0, 10000.0, 0.0)).toDF(
      "wind_speed_mean", "wind_speed_std", "precipitation_mean",
      "precipitation_std", "temperature_mean", "temperature_std",
      "visibility_mean", "visibility_std")
    val pAmp = Predict.predictWithWeather(spark, longsPeak, accidents, wrows,
      cw, historicalStats = Some(stats))
    assert(pAmp.riskScore > pWeather.riskScore)
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
    // EVERY day equals a fresh single predict at that plan date — guards
    // the date-expanded path against enrichment-time hoists going stale
    // (the temporal precompute is derived from __days; an override that
    // doesn't re-derive it would freeze days 1-6 at day-0 decay)
    (1 until 7).foreach { d =>
      val single = Predict.predict(spark,
        longsPeak.copy(plannedDate = f"2024-07-${15 + d}%02d"), accidents)
      assert(approx(risks(d), single.riskScore, 1e-9),
        s"forecast day $d diverges from the single predict")
    }
  }
}
