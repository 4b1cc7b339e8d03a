package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.execution.LogicalRDD

/** The one place that knows how to release a `localCheckpoint`'s storage.
  *
  * The blocks behind a local checkpoint are reclaimed only when their RDD
  * is GC'd; iterative algorithms that checkpoint per round (breadcrumb
  * walk, connected components) would otherwise pile O(rounds) full copies
  * of their frame into the block manager. Callers free each round's frame
  * explicitly once its successor is materialized.
  *
  * The frame handed in may be the checkpointed Dataset itself OR a
  * column-level projection over it (`ck.select(...)`) — the lookup walks
  * through Projects to the underlying [[LogicalRDD]]. It deliberately
  * stops at anything heavier (joins, aggregates): those genuinely derive
  * new data, and unpersisting "the first RDD found somewhere below" would
  * free storage other live plans still depend on.
  */
object CheckpointUtil {
  def checkpointRdd(df: DataFrame): Option[RDD[_]] = {
    def walk(p: LogicalPlan): Option[RDD[_]] = p match {
      case l: LogicalRDD => Some(l.rdd)
      case pr: Project   => walk(pr.child)
      case _             => None
    }
    walk(df.queryExecution.logical)
  }

  /** Best-effort non-blocking release; safe on frames that never were
    * checkpoints (no-op).
    */
  def release(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))
}
