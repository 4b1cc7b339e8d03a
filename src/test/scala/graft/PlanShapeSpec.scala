package graft

import graft.SparkSpec

/** Physical-plan shape guards — the scale properties README promises,
  * asserted against `.explain` output so regressions surface in CI:
  * filter/column pushdown reaches the parquet scan, the kernel joins
  * broadcast with no route-side shuffle before partial aggregation, and
  * the pruned kernel plans an equi-join instead of a cross join.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q02 scan: predicate and column pruning reach the parquet reader") {
    val plan = planOf("q02_scan_filter")
    assert(plan.contains("PushedFilters:"), "no pushed filters in scan")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan.take(2000))
    // projection pruning: the FileScan column list must exclude unused cols
    val scanLine = plan.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    assert(scanLine.contains("l_quantity#") && !scanLine.contains("l_tax#"),
      s"scan reads unpruned columns: $scanLine")
  }

  test("kernel: broadcast join, no shuffle of the routes side before partial agg") {
    val plan = planOf("k08_kernel_risk")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "accidents side not broadcast")
    // the ONLY exchange should be the post-partial-agg hash partitioning
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"unexpected extra shuffles: $exchanges")
  }

  test("pruned kernel: equi-join on grid cells, no cross join in the plan") {
    import org.apache.spark.sql.functions._
    val pruned = graft.kernel.KernelPruning.scoreRoutesPruned(
      graft.queries.Derived.routes(spark, dir),
      graft.queries.Derived.accidents(spark, dir),
      to_date(lit("2024-07-15")))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      "pruned path still plans a cross join")
    assert(plan.contains("BroadcastHashJoin"), "cell join is not a broadcast hash join")
  }

  test("similarity top-k: custom dot-product expression is in the plan (codegen'd)") {
    val plan = planOf("s01_cosine_topk")
    assert(plan.contains("dotproductd") || plan.contains("DotProductD")
      || plan.toLowerCase.contains("dotproduct"), plan.take(1500))
  }
}
