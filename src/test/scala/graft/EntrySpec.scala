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
}
