package graft

/** Driver-contract guards. */
class EntrySpec extends SparkSpec {

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are stable snake_case identifiers") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z][a-z0-9_]*"))
    assert(bad.isEmpty, s"bad names: $bad")
  }

  test("approx_count_distinct (the 100 TB path) tracks exact distinct (q25)") {
    import org.apache.spark.sql.functions._
    // HLL++ with rsd=0.01 must land within a few percent of the exact
    // count — the fixed-memory mergeable sketch that replaces the
    // shuffle-dedup exact form at scale.
    val exact = SparkEntry.queries("q25_distinct_users")(spark, "/root/testdata/sf0.001")
      .select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      assert(math.abs(approx(k) - e) <= math.max(2.0, e * 0.05),
        s"$k: approx ${approx(k)} vs exact $e")
    }
  }

  test("approx_percentile (the 100 TB path) tracks exact percentile (q23)") {
    import org.apache.spark.sql.functions._
    // q23 serves exact interpolated percentiles (oracle-checked); at scale
    // the same report runs on the mergeable sketch. Accuracy contract:
    // with accuracy=10000 the sketch's rank error is ≤ n/10000, so on this
    // value distribution the returned quantile must sit within a small
    // value band of the exact one.
    val exact = SparkEntry.queries("q23_percentiles")(spark, "/root/testdata/sf0.001")
      .select("event_type", "p50", "p95").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("event_type")
      .agg(approx_percentile(col("value"), lit(0.5), lit(10000)).as("p50"),
        approx_percentile(col("value"), lit(0.95), lit(10000)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (e50, e95)) <- exact; (a50, a95) = approx(k)) {
      assert(math.abs(a50 - e50) <= math.max(1.0, math.abs(e50) * 0.05),
        s"$k p50: approx $a50 vs exact $e50")
      assert(math.abs(a95 - e95) <= math.max(1.0, math.abs(e95) * 0.05),
        s"$k p95: approx $a95 vs exact $e95")
    }
  }
}
