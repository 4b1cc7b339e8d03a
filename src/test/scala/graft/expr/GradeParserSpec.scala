package graft.expr

import graft.SparkSpec

/** Exact parity with the reference grade parser
  * (backend/app/services/grade_weighting.py:28-199) — expected values
  * produced by executing the reference `parse_grade` on the same strings.
  */
class GradeParserSpec extends SparkSpec {

  private val expected: Seq[(String, Option[Double])] = Seq(
    "5.9" -> Some(9.0), "5.10a" -> Some(10.0), "5.10b" -> Some(10.25),
    "5.10c" -> Some(10.5), "5.10d" -> Some(10.75), "5.11" -> Some(11.5),
    "5.12a" -> Some(12.0), "V5" -> Some(12.0), "VB" -> Some(9.5),
    "WI4" -> Some(9.6), "AI3" -> Some(9.8), "M6" -> Some(10.0),
    "A2" -> Some(10.4), "C3" -> Some(11.6), "5.10a/b" -> Some(10.125),
    "5.9+" -> Some(9.25), "5.8-" -> Some(7.75), "10a" -> Some(10.0),
    "garbage" -> None, "" -> None)

  test("parse matches reference on every fixture grade") {
    for ((g, exp) <- expected) {
      val got = GradeParser.parse(g)
      (got, exp) match {
        case (Some(a), Some(b)) => assert(approx(a, b, 1e-9), s"'$g': $a vs $b")
        case (None, None) => // ok
        case _ => fail(s"'$g': got $got expected $exp")
      }
    }
    assert(GradeParser.parse(null).isEmpty)
  }

  test("VB parses via V-scale special case, not regex") {
    assert(GradeParser.parse("VB").contains(9.5))
  }

  test("column form + SQL registration") {
    import org.apache.spark.sql.functions._
    GradeParser.register(spark)
    assert(evalNullable(GradeParser.parseGrade(lit("5.10a"))).contains(10.0))
    assert(spark.sql("SELECT parse_grade('V5') AS g").head().getDouble(0) == 12.0)
  }
}
