package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * supported pattern for native-expression libraries built against classic
  * Spark (the converters are stable but not exported; living under the
  * org.apache.spark.sql package grants the access a SparkSessionExtensions-
  * registered function would get implicitly).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a raw expression builder as a SQL temp function on a live
    * session (the ad-hoc sibling of SparkSessionExtensions.injectFunction).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}

/** Plan-level bridge: local checkpointing for ITERATIVE algorithms.
  *
  * `Dataset.localCheckpoint` truncates lineage but deliberately carries
  * the ORIGIN plan's `Statistics` into the replacement [[LogicalRDD]]
  * (`originStats`) so one-shot checkpoints keep their size estimates. For
  * an iterative algorithm that is a trap: round r+1's plan joins k copies
  * of round r's checkpointed frame, so the carried `sizeInBytes` compounds
  * ^k per round — doubly-exponential BigInts whose Toom-Cook
  * multiplications wedge the stats visitor on the DRIVER for hours (a
  * 200K-hop pointer-doubling component run stalls around round 7) while
  * the cluster sits idle. `freshStatsCheckpoint` rebuilds the LogicalRDD
  * WITHOUT origin stats, so every round re-estimates from
  * `defaultSizeInBytes` and planning cost stays constant per round.
  */
object PlanBridge {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.LogicalRDD

  def freshStatsCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.queryExecution.logical match {
      case l: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val clean = LogicalRDD(l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.stream)(session, None, None)
        org.apache.spark.sql.classic.Dataset.ofRows(session, clean)
      case _ => ck // unexpected shape — keep the plain checkpoint
    }
  }
}
