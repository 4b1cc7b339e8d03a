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

  test("null TEMPERATURE series → NULL from native AND staged alike") {
    // a non-null struct with a null temperature array used to diverge: the
    // native expression returns NULL, while the staged form's 3VL-null
    // validity gate fell through to otherwise(base) and leaked a REAL
    // number (temperature degenerating to score 0, other factors live)
    val nullTempPat = WeatherExprs.pattern(
      lit(null).cast("array<double>"),
      array(lit(0.0), lit(0.0), lit(0.0), lit(0.0), lit(0.0)),
      array(lit(5.0), lit(5.0), lit(5.0), lit(5.0), lit(5.0)),
      array(lit(1.0), lit(1.0), lit(1.0), lit(1.0), lit(1.0)),
      array(lit(50.0), lit(50.0), lit(50.0), lit(50.0), lit(50.0)),
      array(struct(lit(0.0).as("min"), lit(1.0).as("avg"), lit(2.0).as("max"))))
    val df = spark.range(1)
      .withColumn("cur", Derived.weatherPattern(lit(Derived.CurrentKey)))
      .withColumn("acc", nullTempPat)
    val native = df.select(
      WeatherPatternSimilarity.similarity(col("cur"), col("acc")).as("v")).head()
    assert(native.isNullAt(0), "native must null on a null temperature array")
    val staged = WeatherExprs.withWeatherSimilarity(df, col("cur"), col("acc"), "s")
      .select("s").head()
    assert(staged.isNullAt(0), "staged must match the native NULL, not leak a number")
    // and the reserved staging prefix is guarded loudly
    intercept[IllegalArgumentException] {
      WeatherExprs.withWeatherSimilarity(
        df.withColumn("__wsim_n", lit(1)), col("cur"), col("acc"), "s")
    }
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

  test("property: native == staged on random patterns incl. degenerate series") {
    // deterministic pseudo-random pattern pairs: varying lengths (5-7),
    // constant series (zero-variance Pearson edge), equal series
    // (corr exactly 1), negated series (corr -1), freeze-thaw straddles
    val rnd = new scala.util.Random(20260812L)
    def series(n: Int, constant: Boolean, base: Double): Seq[Double] =
      if (constant) Seq.fill(n)(base)
      else Seq.fill(n)(base + rnd.nextDouble() * 20 - 10)
    val rows = (0 until 200).map { i =>
      val n1 = 5 + i % 3
      val n2 = 5 + (i / 3) % 3
      def pat(n: Int): (Seq[Double], Seq[Double], Seq[Double], Seq[Double], Seq[Double],
          Seq[(Double, Double, Double)]) = {
        val const = i % 7 == 0
        val t = series(n, const, 10)
        val p = series(n, i % 11 == 0, 2)
        val w = series(n, const, 8)
        val v = series(n, false, 9000)
        val c = series(n, false, 50)
        val dt = t.map(x => (x - 5 - rnd.nextInt(3), x, x + 5 + rnd.nextInt(3)))
        (t, p, w, v, c, dt)
      }
      val a = pat(n1)
      val b = if (i % 13 == 0) a // identical patterns → similarity ≈ 1
        else if (i % 17 == 0) // anti-correlated twin
          (a._1.map(-_), a._2.map(-_), a._3.map(-_), a._4.map(-_), a._5.map(-_), a._6)
        else pat(n2)
      (i.toLong, a, b)
    }
    import spark.implicits._
    val df = rows.toDF("i", "a", "b")
    def toPattern(c: org.apache.spark.sql.Column) =
      graft.weather.WeatherExprs.pattern(
        c.getField("_1"), c.getField("_2"), c.getField("_3"),
        c.getField("_4"), c.getField("_5"),
        transform(c.getField("_6"), t => struct(
          t.getField("_1").as("min"), t.getField("_2").as("avg"),
          t.getField("_3").as("max"))))
    val patterns = df.select(col("i"),
      toPattern(col("a")).as("cur"), toPattern(col("b")).as("acc"))
    val staged = WeatherExprs.withWeatherSimilarity(
      patterns, col("cur"), col("acc"), "s")
    val both = staged.withColumn("nat",
      WeatherPatternSimilarity.similarity(col("cur"), col("acc")))
    val diff = both.where(col("s") =!= col("nat"))
    assert(diff.count() == 0,
      diff.select("i", "s", "nat").head(3).mkString("; "))
    // sanity: identical-pattern rows actually scored ≈ 1
    assert(both.where(col("i") % 13 === 0 && col("s") < 0.999).count() == 0)
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
