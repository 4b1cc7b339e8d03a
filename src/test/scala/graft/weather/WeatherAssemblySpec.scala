package graft.weather

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pattern-assembly semantics (S4/A2/J3) on hand-built weather rows:
  * window gating, Python-`or` defaults (NULL *and* 0.0 → default,
  * predict.py:594-606), min/max fallback to the defaulted avg,
  * chronological ordering, ≥5-day validity, and the neutral-0.5
  * missing-pattern kernel path (safety_algorithm.py:265-269).
  */
class WeatherAssemblySpec extends SparkSpec {

  import spark.implicits._

  private val accDate = Date.valueOf("2024-07-10")

  /** (accident_id, a_date) dim: accident 1 has 7 days, 2 has 4 days
    * (invalid), 3 has exactly 5 (boundary-valid).
    */
  private def accidents: DataFrame =
    Seq((1, accDate), (2, accDate), (3, accDate)).toDF("accident_id", "a_date")

  import WeatherAssemblySpec.W

  private def day(d: Int): Date = Date.valueOf(s"2024-07-${"%02d".format(d)}")

  private def weather: DataFrame = {
    val full = (4 to 10).map { d =>
      W(1, day(d), Some(10.0 + d), Some(5.0 + d), Some(15.0 + d),
        Some(1.0), Some(3.0), Some(9000.0), Some(40.0))
    }
    // day 7 for accident 1: every field NULL or falsy-0.0 → all defaults
    val quirky = full.map(w => if (w.date == day(7))
      w.copy(temperature_avg = Some(0.0), temperature_min = None,
        temperature_max = Some(0.0), precipitation_total = None,
        wind_speed_avg = Some(0.0), visibility_avg = None,
        cloud_cover_avg = Some(0.0))
    else w)
    // out-of-window rows for accident 1 (before window start / after a_date)
    val outOfWindow = Seq(
      W(1, day(3), Some(99.0), None, None, None, None, None, None),
      W(1, day(11), Some(99.0), None, None, None, None, None, None))
    val acc2 = (4 to 7).map(d => W(2, day(d), Some(20.0), None, None,
      Some(0.5), Some(2.0), Some(8000.0), Some(30.0)))
    val acc3 = (5 to 9).map(d => W(3, day(d), Some(1.0 * d), None, None,
      Some(0.0), Some(4.0), Some(7000.0), Some(60.0)))
    (quirky ++ outOfWindow ++ acc2 ++ acc3).toDF()
  }

  private lazy val pats =
    WeatherAssembly.assemblePatterns(weather, accidents)
      .collect().map(r => r.getInt(0) -> r).toMap

  test("validity: <5 days → no pattern; 5 and 7 days → pattern") {
    assert(pats.keySet === Set(1, 3))
    assert(pats(1).getInt(2) === 7)
    assert(pats(3).getInt(2) === 5)
  }

  test("window gating excludes rows outside a_date-6 … a_date") {
    // accident 1 had 9 rows; only the 7 in-window ones assemble
    assert(pats(1).getInt(2) === 7)
    val temps = pats(1).getStruct(1).getSeq[Double](0)
    assert(!temps.contains(99.0))
  }

  test("chronological order, oldest first") {
    val temps = pats(1).getStruct(1).getSeq[Double](0)
    // days 4,5,6 → 14,15,16; day 7 defaulted to 10.0; days 8,9,10 → 18,19,20
    assert(temps === Seq(14.0, 15.0, 16.0, 10.0, 18.0, 19.0, 20.0))
  }

  test("Python-or defaults: NULL and 0.0 both take the default") {
    val p = pats(1).getStruct(1)
    val idx = 3 // day 7 position
    assert(p.getSeq[Double](0)(idx) === 10.0) // temperature (0.0 → default)
    assert(p.getSeq[Double](1)(idx) === 0.0) // precipitation (NULL → 0.0)
    assert(p.getSeq[Double](2)(idx) === 5.0) // wind (0.0 → default)
    assert(p.getSeq[Double](3)(idx) === 10000.0) // visibility (NULL → default)
    assert(p.getSeq[Double](4)(idx) === 50.0) // cloud (0.0 → default)
  }

  test("daily min/max fall back to the DEFAULTED avg") {
    val dt = pats(1).getStruct(1).getSeq[org.apache.spark.sql.Row](5)
    // day 7: min NULL, max 0.0, avg 0.0 → all three collapse to 10.0
    assert(dt(3).getDouble(0) === 10.0)
    assert(dt(3).getDouble(1) === 10.0)
    assert(dt(3).getDouble(2) === 10.0)
    // day 4: explicit min/max survive
    assert(dt(0).getDouble(0) === 9.0)
    assert(dt(0).getDouble(2) === 19.0)
  }

  test("kernel wiring: invalid accident gets neutral wsim 0.5, valid gets real") {
    val cur = graft.queries.Derived.weatherPattern(lit(graft.queries.Derived.CurrentKey))
    val out = WeatherAssembly.accidentsWithSimilarity(accidents, weather, cur)
      .select("accident_id", "wsim").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(2) === 0.5)
    assert(out(1) !== 0.5)
    assert(out(1) >= 0.0 && out(1) <= 1.0)
    assert(out(3) >= 0.0 && out(3) <= 1.0)
  }

  test("NULL current pattern → neutral 0.5 for every accident, never NULL wsim") {
    // a missing forecast (e.g. left-join miss on the bucket) must take the
    // reference's neutral path (optimized.py:552-554), not produce a NULL
    // wsim that silently drops the accident from downstream risk sums
    val cur = graft.queries.Derived.weatherPattern(lit(graft.queries.Derived.CurrentKey))
    val nullCur = when(lit(false), cur)
    val out = WeatherAssembly.accidentsWithSimilarity(accidents, weather, nullCur)
      .select("accident_id", "wsim").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(!r.isNullAt(1), s"accident ${r.get(0)}: wsim must not be NULL")
      assert(r.getDouble(1) === 0.5)
    }
  }

  test("derived weather rows: planted hazard classes all occur at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val acc = graft.queries.Derived.accidents(spark, dir)
    val rows = graft.queries.Derived.weatherRows(spark, dir)
    val perAcc = WeatherAssembly.defaultedRecords(rows, acc)
      .groupBy("accident_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a%13==0 accidents are invalid (<5 in-window days)
    assert(perAcc.filter(_._2 < 5).nonEmpty)
    // out-of-window rows exist but never assemble
    val oow = rows.join(acc.select("accident_id", "a_date"), Seq("accident_id"))
      .where(col("date") > col("a_date") ||
        col("date") < date_sub(col("a_date"), WeatherAssembly.WindowDays))
    assert(oow.count() > 0)
  }
}

object WeatherAssemblySpec {
  case class W(accident_id: Int, date: Date,
    temperature_avg: Option[Double], temperature_min: Option[Double],
    temperature_max: Option[Double], precipitation_total: Option[Double],
    wind_speed_avg: Option[Double], visibility_avg: Option[Double],
    cloud_cover_avg: Option[Double])
}
