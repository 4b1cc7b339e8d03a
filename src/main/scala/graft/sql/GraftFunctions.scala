package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.{DotProductD, GradeParser, SimHash63, WeatherPatternSimilarity}

/** SQL-surface registration for the engine's custom functions.
  *
  * Two deployment modes:
  *  - [[GraftExtensions]] via `spark.sql.extensions=graft.sql.GraftExtensions`
  *    (cluster-wide, the SparkSessionExtensions path — SURVEY §7.3)
  *  - [[GraftFunctions.register]] for ad-hoc registration on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProductD].getName, "dot_f64"),
      (exprs: Seq[Expression]) => DotProductD(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash63].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash63(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("weather_similarity"),
      new ExpressionInfo(classOf[WeatherPatternSimilarity].getName, "weather_similarity"),
      (exprs: Seq[Expression]) => WeatherPatternSimilarity(exprs.head, exprs(1))))
  }
}

object GraftFunctions {
  /** Register every custom function on a live session (SQL-callable). */
  def register(spark: SparkSession): Unit = {
    GradeParser.register(spark)
    val bridge = org.apache.spark.sql.graftbridge.ColumnBridge
    bridge.registerFunction(spark, "dot_f64",
      exprs => DotProductD(exprs.head, exprs(1)))
    bridge.registerFunction(spark, "simhash64",
      exprs => SimHash63(exprs.head))
    bridge.registerFunction(spark, "weather_similarity",
      exprs => WeatherPatternSimilarity(exprs.head, exprs(1)))
  }
}
