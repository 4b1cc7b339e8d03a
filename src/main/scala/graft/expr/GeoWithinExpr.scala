package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `geo_within_km(lat, lon, center_lat, center_lon, radius_km)` — the
  * spatial radius predicate (S2, `backend/app/api/v1/predict.py:440-486`'s
  * `ST_DWithin`) as ONE Catalyst node instead of an opaque trig tree.
  *
  * Why a dedicated expression when [[GeoExprs.haversineKm]]` <= r` computes
  * the same thing: a composed `LessThanOrEqual(Multiply(..., Asin(...)), r)`
  * tree is unrecognizable to an optimizer rule, so the predicate can never
  * be used for data skipping — haversine itself is not a parquet pushdown
  * filter. As a single named node, [[graft.plans.SpatialBboxRule]] can spot
  * it and inject the implied bounding-box range predicates (SURVEY O12 /
  * F3), which DO push down to parquet min/max stats and, on a z-ordered
  * layout ([[GeoExprs.mortonKey]]), skip most of a 100 TB table.
  *
  * Math mirrors `geo_utils.py:12-52` (R=6371): `sin²` is computed as `s*s`
  * (vs the Column form's `pow(s, 2)` — equal for every IEEE double, since
  * squaring is exact in both). Null in ⇒ null out, like any comparison.
  *
  * @param bboxApplied idempotence tag: set by SpatialBboxRule after it has
  *   injected the box so the fixed-point optimizer batch terminates; carries
  *   no runtime semantics.
  */
case class GeoWithinKm(lat: Expression, lon: Expression,
    centerLat: Expression, centerLon: Expression, radiusKm: Expression,
    bboxApplied: Boolean = false)
  extends Expression with Predicate with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(lat, lon, centerLat, centerLon, radiusKm)
  override def nullable: Boolean = children.exists(_.nullable)

  /** Analyzer-driven coercion: SQL callers can pass decimal literals
    * (`40.0` parses as DECIMAL(3,1)) or float columns and get the double
    * cast for free — same behavior the Column factory applies explicitly.
    */
  // (Seq[DataType] refines Seq[AbstractDataType]; the parent type is private[sql])
  override def inputTypes: Seq[DataType] = Seq.fill(5)(DoubleType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geo_within_km requires 5 double arguments, got ${children.map(_.dataType).mkString(", ")}")

  override def eval(input: InternalRow): Any = {
    val v = new Array[Double](5)
    var i = 0
    while (i < 5) {
      val x = children(i).eval(input)
      if (x == null) return null
      v(i) = x.asInstanceOf[Double]
      i += 1
    }
    GeoWithinKm.haversineKm(v(0), v(1), v(2), v(3)) <= v(4)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val d = ctx.freshName("dist")
    val dLat = ctx.freshName("dLat")
    val dLon = ctx.freshName("dLon")
    val sa = ctx.freshName("sa")
    val sb = ctx.freshName("sb")
    val a = ctx.freshName("a")
    val nullChecks = evals.filter(_.isNull != FalseLiteral)
    val anyNull =
      if (nullChecks.isEmpty) "false" else nullChecks.map(_.isNull.code).mkString(" || ")
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(code =
      code"""
$childCode
boolean ${ev.isNull} = $anyNull;
boolean ${ev.value} = false;
if (!${ev.isNull}) {
  double $dLat = Math.toRadians(${evals(2).value} - ${evals(0).value});
  double $dLon = Math.toRadians(${evals(3).value} - ${evals(1).value});
  double $sa = Math.sin($dLat / 2.0);
  double $sb = Math.sin($dLon / 2.0);
  double $a = $sa * $sa +
    Math.cos(Math.toRadians(${evals(0).value})) *
    Math.cos(Math.toRadians(${evals(2).value})) * $sb * $sb;
  double $d = 2.0 * ${GeoExprs.EarthRadiusKm} * Math.asin(Math.sqrt($a));
  ${ev.value} = $d <= ${evals(4).value};
}""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoWithinKm =
    copy(lat = newChildren(0), lon = newChildren(1), centerLat = newChildren(2),
      centerLon = newChildren(3), radiusKm = newChildren(4))
}

object GeoWithinKm {
  /** Scalar haversine, same operation order as the codegen above. */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val sa = math.sin(dLat / 2.0)
    val sb = math.sin(dLon / 2.0)
    val a = sa * sa +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * sb * sb
    2.0 * GeoExprs.EarthRadiusKm * math.asin(math.sqrt(a))
  }

  /** Column factory (casts arguments to double like the SQL surface). */
  def geoWithinKm(lat: Column, lon: Column,
      centerLat: Column, centerLon: Column, radiusKm: Column): Column = {
    def e(c: Column) = ColumnBridge.expression(c.cast("double"))
    ColumnBridge.column(GeoWithinKm(e(lat), e(lon), e(centerLat), e(centerLon), e(radiusKm)))
  }
}
