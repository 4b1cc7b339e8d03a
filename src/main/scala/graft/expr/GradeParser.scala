package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Climbing-grade parser: YDS / V-scale / WI / AI / M / A / C strings →
  * normalized difficulty on a 0–20 float scale.
  *
  * Reference semantics: `backend/app/services/grade_weighting.py:28-199`
  * (lookup table, +/- modifiers ±0.25, slash-grade averaging, V≈10+0.4v,
  * WI≈6+1.2(n−1), AI≈7+1.4(n−1), M≈7+0.6(n−1), A/C≈8+1.2n, bare-grade
  * "10a" fallback re-parsed as "5.10a").
  *
  * This is the one regex-heavy scalar in the engine, so it is a Scala UDF
  * (deterministic, null-safe) rather than a `when` chain; it runs once per
  * route/accident row during enrichment — never inside the cross-join hot
  * path, which sees only the parsed numeric column.
  */
object GradeParser {

  /** ref: grade_weighting.py:28-44 */
  private val YdsGrades: Map[String, Double] = {
    val plain = (0 to 9).map(i => s"5.$i" -> i.toDouble).toMap
    val lettered = (10 to 15).flatMap { n =>
      Seq(s"5.${n}a" -> (n + 0.0), s"5.${n}b" -> (n + 0.25),
        s"5.${n}c" -> (n + 0.5), s"5.${n}d" -> (n + 0.75),
        s"5.$n" -> (n + 0.5))
    }.toMap
    plain ++ lettered
  }

  /** The lookup table, exposed for the k26 oracle generator: the DuckDB
    * twin's VALUES list is emitted from THIS map, so the two cannot drift.
    */
  private[graft] def ydsTable: Seq[(String, Double)] = YdsGrades.toSeq.sortBy(_._1)

  private val VScaleOffset = 10.0
  private val VScaleMultiplier = 0.4

  private val VRe = "^V(\\d+)".r.unanchored
  private val WiRe = "^WI(\\d+)".r.unanchored
  private val AiRe = "^AI(\\d+)".r.unanchored
  private val MRe = "^M(\\d+)".r.unanchored
  private val ARe = "^A(\\d+)".r.unanchored
  private val CRe = "^C(\\d+)".r.unanchored
  private val YdsBaseRe = "^(5\\.\\d+)".r.unanchored

  /** ref: grade_weighting.py:52-84 */
  private def parseYds(grade: String): Option[Double] = {
    val g = grade.trim.toLowerCase
    YdsGrades.get(g).orElse {
      if (g.endsWith("+")) YdsGrades.get(g.dropRight(1)).map(_ + 0.25)
      else if (g.endsWith("-")) YdsGrades.get(g.dropRight(1)).map(_ - 0.25)
      else if (g.contains("/")) {
        g.split("/", -1) match {
          case Array(first, suffix) =>
            for {
              f <- parseYds(first)
              base <- YdsBaseRe.findFirstMatchIn(first).map(_.group(1))
              s <- parseYds(base + suffix)
            } yield (f + s) / 2
          case _ => None
        }
      } else None
    }
  }

  /** ref: grade_weighting.py:87-101 */
  private def parseV(grade: String): Option[Double] = {
    val g = grade.trim.toUpperCase
    g match {
      case VRe(n) => Some(VScaleOffset + n.toInt * VScaleMultiplier)
      case _ if g == "VB" => Some(VScaleOffset - 0.5)
      case _ => None
    }
  }

  /** ref: grade_weighting.py:104-130 */
  private def parseIce(grade: String): Option[Double] = {
    val g = grade.trim.toUpperCase
    g match {
      case WiRe(n) => Some(6.0 + (n.toInt - 1) * 1.2)
      case AiRe(n) => Some(7.0 + (n.toInt - 1) * 1.4)
      case MRe(n) => Some(7.0 + (n.toInt - 1) * 0.6)
      case _ => None
    }
  }

  /** ref: grade_weighting.py:133-149 */
  private def parseAid(grade: String): Option[Double] = {
    val g = grade.trim.toUpperCase
    g match {
      case ARe(n) => Some(8.0 + n.toInt * 1.2)
      case CRe(n) => Some(8.0 + n.toInt * 1.2)
      case _ => None
    }
  }

  /** Full cascade (ref: grade_weighting.py:152-199). */
  def parse(grade: String): Option[Double] = {
    Option(grade).map(_.trim).filter(_.nonEmpty).flatMap { g =>
      val lower = g.toLowerCase
      val upper = g.toUpperCase
      val yds = if (lower.startsWith("5.")) parseYds(g) else None
      lazy val v = if (upper.startsWith("V")) parseV(g) else None
      lazy val ice =
        if (Seq("WI", "AI", "M").exists(upper.startsWith)) parseIce(g) else None
      lazy val aid =
        if (Seq("A", "C").exists(upper.startsWith) && g.length >= 2 && g(1).isDigit)
          parseAid(g)
        else None
      yds.orElse(v).orElse(ice).orElse(aid).orElse(parseYds("5." + g))
    }
  }

  private val parseUdf = udf((g: String) => parse(g))

  /** Column form; also registered for SQL as `parse_grade` via [[register]]. */
  def parseGrade(grade: Column): Column = parseUdf(grade)

  def register(spark: SparkSession): Unit =
    spark.udf.register("parse_grade", (g: String) => parse(g))

  /** Expression builder so the SparkSessionExtensions path (GraftExtensions)
    * exposes the same `parse_grade` SQL surface as the live-session
    * [[register]] — the UDF's Column form round-trips through the bridge.
    */
  def parseExpression(child: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(
      parseUdf(org.apache.spark.sql.graftbridge.ColumnBridge.column(child)))
}
