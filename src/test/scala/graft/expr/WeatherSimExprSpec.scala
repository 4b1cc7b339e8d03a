package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Derived
import graft.weather.WeatherExprs

/** The native WeatherPatternSimilarity must be BIT-IDENTICAL to the staged
  * Column form (WeatherExprs.withWeatherSimilarity) — the DuckDB oracles for
  * k14/k16/k18 hash values produced by the native kernel, while w04 hashes
  * the staged form, so exact (==, not ≈) agreement is what keeps both green.
  */
class WeatherSimExprSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("native == staged, bit-for-bit, on every derived pattern pair") {
    // all accident patterns vs the shared current pattern — the exact
    // pairing the kernel queries evaluate
    val df = Derived.accidents(spark, sfDir)
      .select(col("accident_id"))
      .withColumn("cur", Derived.weatherPattern(lit(Derived.CurrentKey)))
      .withColumn("acc", Derived.weatherPattern(col("accident_id")))
    val staged = WeatherExprs.withWeatherSimilarity(df, col("cur"), col("acc"), "s")
    val both = staged
      .withColumn("nat", WeatherPatternSimilarity.similarity(col("cur"), col("acc")))
    val diff = both.where(col("s") =!= col("nat") ||
      col("s").isNull =!= col("nat").isNull)
    assert(diff.count() == 0, diff.select("accident_id", "s", "nat").head(5).mkString("; "))
    assert(both.count() > 0)
  }

  test("native == staged over ASSEMBLED patterns (defaults, short series)") {
    // the w07 assembly output carries every planted hazard: missing days,
    // 5/6-day boundary patterns, defaulted fields
    val pats = graft.weather.WeatherAssembly.assemblePatterns(
      Derived.weatherRows(spark, sfDir), Derived.accidents(spark, sfDir))
      .withColumn("cur", Derived.weatherPattern(lit(Derived.CurrentKey)))
    val staged = WeatherExprs.withWeatherSimilarity(pats, col("cur"), col("pattern"), "s")
    val both = staged
      .withColumn("nat", WeatherPatternSimilarity.similarity(col("cur"), col("pattern")))
    assert(both.where(col("s") =!= col("nat")).count() == 0)
    assert(both.count() > 0)
  }

  test("null accident pattern → NULL (callers coalesce to neutral 0.5)") {
    val df = spark.range(1)
      .withColumn("cur", Derived.weatherPattern(lit(Derived.CurrentKey)))
      .withColumn("acc", when(lit(false), Derived.weatherPattern(lit(1L))))
    val out = df.select(
      WeatherPatternSimilarity.similarity(col("cur"), col("acc")).as("v")).head()
    assert(out.isNullAt(0))
  }

  test("<5-day side → 0.0, exactly like the staged validity gate") {
    def shortPat = WeatherExprs.pattern(
      array(lit(1.0), lit(2.0), lit(3.0)), array(lit(0.0), lit(0.0), lit(0.0)),
      array(lit(5.0), lit(5.0), lit(5.0)), array(lit(1.0), lit(1.0), lit(1.0)),
      array(lit(50.0), lit(50.0), lit(50.0)),
      array(struct(lit(0.0).as("min"), lit(1.0).as("avg"), lit(2.0).as("max"))))
    val df = spark.range(1)
      .withColumn("cur", Derived.weatherPattern(lit(Derived.CurrentKey)))
      .withColumn("acc", shortPat)
    val v = df.select(
      WeatherPatternSimilarity.similarity(col("cur"), col("acc")).as("v"))
      .head().getDouble(0)
    assert(v == 0.0)
  }

  test("mixed-length pair (7-day current vs 5-day accident) agrees exactly") {
    // 5 valid days: slice-to-min-n path and the decay-weight renormalization
    // both depend on n — staged and native must agree on the boundary.
    // sf0.01: sf0.001's 10 accidents yield no surviving 5/6-day pattern.
    val dir01 = "/root/testdata/sf0.01"
    val pats = graft.weather.WeatherAssembly.assemblePatterns(
      Derived.weatherRows(spark, dir01), Derived.accidents(spark, dir01))
      .withColumn("cur", Derived.weatherPattern(lit(Derived.CurrentKey)))
    val staged = WeatherExprs.withWeatherSimilarity(pats, col("cur"), col("pattern"), "s")
    val both = staged
      .withColumn("nat", WeatherPatternSimilarity.similarity(col("cur"), col("pattern")))
      .withColumn("n", size(col("pattern.temperature")))
    assert(both.where(col("n") < 7).count() > 0, "no short assembled patterns — fixture drift")
    assert(both.where(col("s") =!= col("nat")).count() == 0)
  }
}
