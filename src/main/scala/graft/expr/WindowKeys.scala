package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers for window partition specs. */
object WindowKeys {

  /** A per-row constant ("") partition key that Catalyst cannot fold away.
    *
    * A literal key (`partitionBy(lit(0))`) is constant-folded out of the
    * Window spec, so WindowExec still treats the window as unpartitioned
    * and logs its move-everything-to-one-partition warning. Deriving the
    * constant from a data column keeps the spec non-empty while still
    * producing a single partition.
    *
    * Use ONLY over frames that are provably bounded (pre-aggregated /
    * top-k-limited) — it pins the whole input to one task by design.
    */
  def pinned(anchor: Column): Column =
    substring(coalesce(anchor.cast("string"), lit("")), 0, 0)
}
