package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the as-of join (q28) — the value-level gate is DuckDB's
  * native ASOF JOIN; these pin the semantics a user relies on.
  */
class AsofJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q28: every match is the NEWEST snapshot at-or-before the event") {
    val out = CoreQueries.queries("q28_asof_join")(spark, dir)
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"))
    val joined = out.join(ev, "event_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val snapTs = r.getTimestamp(r.fieldIndex("snap_ts"))
      val ts = r.getTimestamp(r.fieldIndex("ts"))
      assert(!snapTs.after(ts), s"event ${r.getLong(0)}: snapshot after event")
      // score encodes (user_id, k): decode and check it's the newest k
      val user = r.getLong(r.fieldIndex("user_id"))
      val k = r.getLong(r.fieldIndex("score")) - user * 10
      assert(k >= 0 && k < 8, s"score does not decode to a snapshot index: $k")
      // the NEXT snapshot (k+1) must be strictly after the event
      if (k < 7) {
        val nextSnapSec = 1704067200L + ((k + 1) * 96 + user % 24) * 3600
        assert(ts.getTime / 1000 < nextSnapSec,
          s"event ${r.getLong(0)}: a newer snapshot (k=${k + 1}) was available")
      }
    }
  }

  test("q28: events before their user's first snapshot are dropped (inner as-of)") {
    val out = CoreQueries.queries("q28_asof_join")(spark, dir)
    val matched = out.select("event_id").collect().map(_.getLong(0)).toSet
    val early = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
      .where(unix_timestamp(col("ts")) < lit(1704067200L) + (col("user_id") % 24) * 3600)
      .collect()
    early.foreach { r =>
      assert(!matched.contains(r.getLong(0)),
        s"event ${r.getLong(0)} precedes its first snapshot but matched")
    }
    // and matched ∪ early covers every event exactly once
    val total = graft.Tables.events(spark, dir).count()
    assert(matched.size + early.length == total)
  }
}
