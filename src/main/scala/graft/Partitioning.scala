package graft

import org.apache.spark.sql.DataFrame

/** Partition-balance helpers for compute-heavy map sides. */
object Partitioning {

  /** Spread a small-split input across the cluster before a compute-heavy
    * stage. A tiny single-row-group parquet file scans as ONE split no
    * matter what `maxPartitionBytes` says, which serializes any downstream
    * per-row compute (hashing, trig, explodes) onto one core. At real
    * scale a scan already has ≥ defaultParallelism splits and this is a
    * no-op — no shuffle is added.
    *
    * CONTRACT: intended for scan-/limit-rooted frames (every current call
    * site). `df.rdd` resolves the physical plan, and under AQE that
    * EXECUTES any upstream shuffle stages just to read the partition
    * count — a frame containing aggregates/joins would run that pipeline
    * twice. For such frames call `repartition` explicitly instead.
    */
  def balanced(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
