package graft.weather

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Derived

/** The bucket-memo factorization must be INVISIBLE in the results: fanning
  * the (bucket × accident) memo out to locations has to produce exactly the
  * per-(location, accident) similarities a direct computation would — the
  * same cache-consistency property the reference's in-process dict relies
  * on (`safety_computation_optimized.py:516-568`).
  */
class WeatherMemoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def locs = Derived.locations(spark, dir)
    .withColumn("bucket", col("location_id") % 10)

  private def currentFor(b: org.apache.spark.sql.Column) =
    Derived.weatherPattern(lit(Derived.CurrentKey) + b)

  test("memo grain: one row per (distinct bucket × accident)") {
    val memo = WeatherMemo.similarityMemo(
      locs, "bucket", Derived.accidents(spark, dir),
      Derived.weatherRows(spark, dir), currentFor)
    val nAcc = Derived.accidents(spark, dir).count()
    assert(memo.count() == 10 * nAcc)
    assert(memo.select("bucket").distinct().count() == 10)
  }

  test("fan-out == direct per-location computation, bit-for-bit") {
    val memo = WeatherMemo.similarityMemo(
      locs, "bucket", Derived.accidents(spark, dir),
      Derived.weatherRows(spark, dir), currentFor)
    val via = WeatherMemo.attachToLocations(locs, memo, "bucket")
      .select("location_id", "accident_id", "wsim")

    // direct: every location recomputes its own similarity (what the memo
    // exists to avoid — |locations|/|buckets| = 15× more evaluations here)
    val accPat = Derived.accidents(spark, dir).select("accident_id")
      .join(WeatherAssembly.assemblePatterns(
        Derived.weatherRows(spark, dir), Derived.accidents(spark, dir))
        .select("accident_id", "pattern"), Seq("accident_id"), "left")
    val direct = locs.crossJoin(broadcast(accPat))
      .withColumn("wsim",
        when(col("pattern").isNull,
          lit(graft.kernel.SafetyKernel.NeutralWeatherSimilarity))
          .otherwise(graft.expr.WeatherPatternSimilarity.similarity(
            currentFor(col("bucket")), col("pattern"))))
      .select("location_id", "accident_id", "wsim")

    assert(via.count() == direct.count())
    assert(via.except(direct).count() == 0)
    assert(direct.except(via).count() == 0)
  }

  test("neutral 0.5 for every accident without a valid pattern, per bucket") {
    val memo = WeatherMemo.similarityMemo(
      locs, "bucket", Derived.accidents(spark, dir),
      Derived.weatherRows(spark, dir), currentFor)
    val valid = WeatherAssembly.assemblePatterns(
      Derived.weatherRows(spark, dir), Derived.accidents(spark, dir))
      .select("accident_id")
    val invalidMemo = memo.join(valid, Seq("accident_id"), "left_anti")
    assert(invalidMemo.count() > 0, "fixture drift: no invalid-pattern accidents")
    assert(invalidMemo.where(col("wsim") =!= 0.5).count() == 0)
  }
}
