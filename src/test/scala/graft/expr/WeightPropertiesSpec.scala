package graft.expr

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property-style range/monotonicity checks the reference lacks (SURVEY §5):
  * ScalaCheck generators drive the inputs; evaluation happens in bulk over
  * one generated DataFrame per property to keep Spark round-trips cheap.
  */
class WeightPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private val types = Seq("alpine", "ice", "mixed", "trad", "sport", "aid", "boulder", "junk")
  private val rnd = new scala.util.Random(42)

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("all factor weights stay in their documented ranges over random inputs") {
    val rows = (1 to 500).map { _ =>
      (rnd.nextDouble() * 2000.0, // distance km
        types(rnd.nextInt(types.size)),
        rnd.nextDouble() * 9000 - 500, // route elev
        rnd.nextDouble() * 9000 - 500, // accident elev
        rnd.nextDouble() * 20, // route difficulty
        rnd.nextDouble() * 20, // accident difficulty
        rnd.nextInt(10000)) // days offset
    }.toDF("dist", "rt", "re", "ae", "rd", "ad", "days")
      .withColumn("acc_date", date_sub(to_date(lit("2024-07-15")), col("days")))

    val stats = rows.select(
      WeightExprs.spatialWeight(col("dist"), col("rt")).as("sw"),
      WeightExprs.temporalWeight(to_date(lit("2024-07-15")), col("acc_date"), col("rt")).as("tw"),
      WeightExprs.elevationWeight(col("re"), col("ae"), col("rt")).as("ew"),
      WeightExprs.gradeWeight(col("rd"), col("ad")).as("gw"))
      .agg(
        min("sw").as("sw_min"), max("sw").as("sw_max"),
        min("tw").as("tw_min"), max("tw").as("tw_max"),
        min("ew").as("ew_min"), max("ew").as("ew_max"),
        min("gw").as("gw_min"), max("gw").as("gw_max"))
      .head()

    assert(stats.getAs[Double]("sw_min") >= 0.0 && stats.getAs[Double]("sw_max") <= 1.0)
    // temporal: floor = 1-0.35 = 0.65, cap = 1.0 × 1.05 boost
    assert(stats.getAs[Double]("tw_min") >= 0.65 && stats.getAs[Double]("tw_max") <= 1.05)
    assert(stats.getAs[Double]("ew_min") >= 1.0 && stats.getAs[Double]("ew_max") <= 1.15)
    assert(stats.getAs[Double]("gw_min") >= 0.25 && stats.getAs[Double]("gw_max") <= 1.0)
  }

  test("route-type weight total map stays in [0.2, 1.0], diagonal = 1") {
    for (p <- types.dropRight(1); a <- types.dropRight(1)) {
      val w = evalDouble(WeightExprs.routeTypeWeight(lit(p), lit(a)))
      assert(w >= 0.2 && w <= 1.0, s"($p,$a) = $w")
      if (p == a) assert(w == 1.0)
    }
  }

  test("spatial weight decreases monotonically with distance") {
    val ws = (0 to 20).map(i =>
      evalDouble(WeightExprs.spatialWeight(lit(i * 50.0), lit("alpine"))))
    ws.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
  }

  test("grade parser: parsed difficulties always in [0, 21] when defined (scalacheck inputs)") {
    val gen = Gen.oneOf(
      Gen.chooseNum(0, 15).map(n => s"5.$n"),
      Gen.chooseNum(0, 17).map(n => s"V$n"),
      Gen.chooseNum(1, 8).map(n => s"WI$n"),
      Gen.alphaStr)
    sample(gen, 300).foreach { g =>
      GradeParser.parse(g).foreach { v =>
        assert(v >= -1.0 && v <= 21.0, s"'$g' → $v")
      }
    }
  }
}
