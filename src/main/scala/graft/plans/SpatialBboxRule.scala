package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expr.GeoWithinKm

/** Catalyst optimizer rule: spatial radius predicates become data-skipping
  * range predicates.
  *
  * `Filter(geo_within_km(lat, lon, cLat, cLon, r))` is a black box to every
  * downstream machinery — parquet row-group stats, partition pruning,
  * z-order file skipping all need plain `col <op> literal` comparisons.
  * This rule conjoins the predicate's implied bounding box
  * (SURVEY O12 / F3, `geo_utils.py:102-139`):
  *
  * `lat BETWEEN cLat±Δlat AND lon BETWEEN cLon±Δlon AND geo_within_km(...)`
  *
  * The exact haversine check stays — the box only over-approximates the
  * circle, so the rewrite is semantics-preserving (lossless). The injected
  * comparisons then ride the normal operator-optimization batch: pushed
  * through projects, folded, and — on a [[graft.expr.GeoExprs.mortonKey]]
  * z-clustered layout — turned into file/row-group skips, which is the
  * difference between scanning 100 TB and scanning the files around one
  * mountain (GeoLayoutSpec measures the skip rate).
  *
  * Conservative bounds (box must contain the whole spherical cap):
  *  - Δlat = r/111.0 — 111.0 km/° underestimates the true 111.195 km/°, so
  *    the delta over-covers.
  *  - Δlon = r/(111.0·cos(φ_edge)) with φ_edge = |cLat|+Δlat, the box's most
  *    poleward latitude. The cap's true max longitude extent
  *    `asin(sin(r/R)/cos(cLat))` occurs at a latitude *between* center and
  *    edge, where the cosine is strictly larger — so the edge cosine bounds
  *    it from above.
  *  - Near poles (φ_edge ≥ 89.9°) or when the box would cross the ±180°
  *    antimeridian, the rule injects nothing (the exact predicate alone is
  *    still correct; such scans are vanishingly rare and inherently global
  *    in longitude).
  *
  * Applies only when center and radius are foldable literals (the
  * interactive predict shape — one center per query) and lat/lon are
  * deterministic. The `bboxApplied` tag keeps the rule idempotent inside
  * Catalyst's fixed-point batch.
  *
  * Registered via [[graft.sql.GraftExtensions]] (injectOptimizerRule → runs
  * inside the operator-optimization batch, before predicate pushdown) or on
  * a live session through `spark.experimental.extraOptimizations` (end of
  * optimization — still above the relation for the common scan→filter
  * shape, so V1 parquet pushdown picks the box up during physical planning).
  */
object SpatialBboxRule extends Rule[LogicalPlan] {

  /** An untagged radius predicate with a literal NON-NULL center/radius —
    * the shape the rule can act on. Non-literal centers are left untouched
    * (not even tagged): constant folding inside the same fixed-point batch
    * may still turn them into literals on a later iteration. Null literals
    * (e.g. `CAST(NULL AS DOUBLE)` folded by the same batch) are also left
    * uninjected — the exact predicate evaluates to NULL and the Filter
    * drops every row, which is already the right answer; matching them here
    * would send a null through injectBox's non-null binding and crash.
    */
  private def injectable(e: Expression): Boolean = e match {
    case GeoWithinKm(lat, lon, Literal(_: Double, DoubleType), Literal(_: Double, DoubleType),
        Literal(r: Double, DoubleType), false) =>
      lat.deterministic && lon.deterministic && r >= 0
    case _ => false
  }

  /** Only TOP-LEVEL conjuncts of the Filter condition are rewritten. Under
    * a Filter, `g` → `box AND g` can at worst turn a NULL predicate into
    * FALSE — both drop the row, so conjunct position is three-valued-logic
    * safe even with nullable coordinates. Anywhere else (under NOT / OR /
    * CASE) the NULL→FALSE flip is observable (`NOT(NULL)` drops the row,
    * `NOT(FALSE)` keeps it), so nested occurrences are left untouched.
    */
  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) if splitAnd(cond).exists(injectable) =>
      f.copy(condition = splitAnd(cond).map {
        case g: GeoWithinKm if injectable(g) => injectBox(g)
        case other => other
      }.reduce(And))
  }

  /** The conservative box for a cap at (cLat, cLon) with radius r km —
    * `Some((latLo, latHi, lonLo, lonHi))`, or None when injection must be
    * skipped (polar edge / antimeridian crossing). Public so the
    * losslessness property (every point of the cap falls inside the box)
    * is testable directly against the same arithmetic the rule emits.
    */
  def boxBounds(cLat: Double, cLon: Double, r: Double): Option[(Double, Double, Double, Double)] = {
    val dLat = r / 111.0
    val latEdge = math.abs(cLat) + dLat
    if (latEdge >= 89.9) None
    else {
      val dLon = r / (111.0 * math.cos(math.toRadians(latEdge)))
      if (cLon - dLon <= -180.0 || cLon + dLon >= 180.0) None
      else Some((cLat - dLat, cLat + dLat, cLon - dLon, cLon + dLon))
    }
  }

  private def injectBox(g: GeoWithinKm): Expression = (g: @unchecked) match {
    case GeoWithinKm(lat, lon,
        Literal(cLat: Double, DoubleType), Literal(cLon: Double, DoubleType),
        Literal(r: Double, DoubleType), false) =>
      val tagged = g.copy(bboxApplied = true)
      boxBounds(cLat, cLon, r) match {
        case None => tagged
        case Some((latLo, latHi, lonLo, lonHi)) =>
          val box = And(
            And(GreaterThanOrEqual(lat, Literal(latLo, DoubleType)),
              LessThanOrEqual(lat, Literal(latHi, DoubleType))),
            And(GreaterThanOrEqual(lon, Literal(lonLo, DoubleType)),
              LessThanOrEqual(lon, Literal(lonHi, DoubleType))))
          And(box, tagged)
      }
  }
}
