package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.{BitmapDistinct, CmsMergeAgg, CountMinAgg, DotProductD, DotProductI8, GeoWithinKm, GradeParser, HistogramAgg, Int8Pack, RegisterMergeAgg, RegisterSketchAgg, SimHash63, WeatherPatternSimilarity}
import graft.plans.SpatialBboxRule

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
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[graft.expr.MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => graft.expr.MinHashExpr.fromSql(exprs)))
    ext.injectFunction((
      FunctionIdentifier("weather_similarity"),
      new ExpressionInfo(classOf[WeatherPatternSimilarity].getName, "weather_similarity"),
      (exprs: Seq[Expression]) => WeatherPatternSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("geo_within_km"),
      new ExpressionInfo(classOf[GeoWithinKm].getName, "geo_within_km"),
      (exprs: Seq[Expression]) =>
        GeoWithinKm(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4))))
    ext.injectFunction((
      FunctionIdentifier("bitmap_distinct"),
      new ExpressionInfo(classOf[BitmapDistinct].getName, "bitmap_distinct"),
      (exprs: Seq[Expression]) => BitmapDistinct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("int8_pack"),
      new ExpressionInfo(classOf[Int8Pack].getName, "int8_pack"),
      (exprs: Seq[Expression]) => Int8Pack(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_i8"),
      new ExpressionInfo(classOf[DotProductI8].getName, "dot_i8"),
      (exprs: Seq[Expression]) => DotProductI8(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "cms_sketch"),
      (exprs: Seq[Expression]) => CountMinAgg(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("register_sketch"),
      new ExpressionInfo(classOf[RegisterSketchAgg].getName, "register_sketch"),
      (exprs: Seq[Expression]) => RegisterSketchAgg(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cms_merge"),
      new ExpressionInfo(classOf[CmsMergeAgg].getName, "cms_merge"),
      (exprs: Seq[Expression]) => CmsMergeAgg(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("register_merge"),
      new ExpressionInfo(classOf[RegisterMergeAgg].getName, "register_merge"),
      (exprs: Seq[Expression]) => RegisterMergeAgg(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("hist_sketch"),
      new ExpressionInfo(classOf[HistogramAgg].getName, "hist_sketch"),
      (exprs: Seq[Expression]) => HistogramAgg(exprs(0), exprs(1), exprs(2), exprs(3))))
    // parse_grade too: both deployment modes must expose the same SQL surface
    ext.injectFunction((
      FunctionIdentifier("parse_grade"),
      new ExpressionInfo(GradeParser.getClass.getName, "parse_grade"),
      (exprs: Seq[Expression]) => GradeParser.parseExpression(exprs.head)))
    // bbox injection for geo_within_km filters — inside the operator-
    // optimization batch, so the injected ranges get pushed/folded normally
    ext.injectOptimizerRule(_ => SpatialBboxRule)
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
    bridge.registerFunction(spark, "minhash_sigs",
      exprs => graft.expr.MinHashExpr.fromSql(exprs))
    bridge.registerFunction(spark, "weather_similarity",
      exprs => WeatherPatternSimilarity(exprs.head, exprs(1)))
    bridge.registerFunction(spark, "geo_within_km",
      exprs => GeoWithinKm(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4)))
    bridge.registerFunction(spark, "bitmap_distinct",
      exprs => BitmapDistinct(exprs(0), exprs(1)))
    bridge.registerFunction(spark, "int8_pack",
      exprs => Int8Pack(exprs.head))
    bridge.registerFunction(spark, "dot_i8",
      exprs => DotProductI8(exprs.head, exprs(1)))
    bridge.registerFunction(spark, "cms_sketch",
      exprs => CountMinAgg(exprs(0), exprs(1), exprs(2)))
    bridge.registerFunction(spark, "register_sketch",
      exprs => RegisterSketchAgg(exprs(0), exprs(1)))
    bridge.registerFunction(spark, "cms_merge",
      exprs => CmsMergeAgg(exprs(0)))
    bridge.registerFunction(spark, "register_merge",
      exprs => RegisterMergeAgg(exprs(0)))
    bridge.registerFunction(spark, "hist_sketch",
      exprs => HistogramAgg(exprs(0), exprs(1), exprs(2), exprs(3)))
    // live-session twin of injectOptimizerRule (runs as the optimizer's
    // final user batch — still above the scan for the filter-on-scan shape)
    if (!spark.experimental.extraOptimizations.contains(SpatialBboxRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpatialBboxRule
  }
}
