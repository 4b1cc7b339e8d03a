package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout techniques for the 100 TB tier (SURVEY §4): bucketing,
  * so repeated equi-joins on a key are EXCHANGE-FREE, and deterministic
  * salting, so skewed keys stop serializing a stage.
  *
  * Bucketing is the pre-pay move: one shuffle at WRITE time (into N
  * hash-buckets per key, sorted within buckets) buys every later join or
  * aggregation on that key a plan with no Exchange at all — for the scores
  * ⋈ routes serving join, which the reference runs on every map load, that
  * turns the nightly-written scores table into a zero-shuffle read path.
  *
  * Salting is the rescue move when one key dominates (the reference shape:
  * half the accidents in one popular climbing area): append a
  * deterministic salt to the hot key so its rows spread over `factor`
  * reducers, aggregate partially per salted key, then finish per original
  * key. Two exchanges of SMALL partial rows instead of one exchange that
  * funnels the hot key through a single task. (AQE's skew-join handling
  * covers the JOIN side of the same problem at runtime — documented in
  * Bench/AnsiCheck; salting covers aggregation and pre-AQE plans.)
  */
object ScaleLayout {

  /** Write `df` hash-bucketed (and sorted) by `key` into the session
    * catalog as `table`. Joins/aggs between tables bucketed on the same
    * key with the same bucket count plan with NO Exchange
    * (ScaleLayoutSpec asserts it).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi-join two same-key same-count bucketed tables — exchange-free by
    * layout, not by optimizer luck.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Two-phase salted aggregation: the aggregates must be decomposable
    * (sum/count/min/max — anything where partial-of-partial = total).
    * Phase 1 groups by (key, salt); phase 2 merges the ≤`factor` partials
    * per key. The hot key's rows now spread across `factor` reducers in
    * phase 1, and phase 2 only ever sees `factor` rows per key.
    *
    * The salt is positional (`monotonically_increasing_id % factor`), NOT
    * a content hash: the worst skew is millions of byte-identical rows on
    * the hot key (default-filled upstream records), and a content hash
    * would assign them all the SAME salt, re-serializing the stage. Salt
    * placement never affects the merged totals, so the positional salt's
    * dependence on partitioning is invisible in the results.
    */
  def saltedSumAggregate(df: DataFrame, key: String, valueCol: String,
                         factor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial_sum"), count(lit(1)).as("__partial_n"))
      .groupBy(col(key))
      .agg(sum("__partial_sum").as(s"sum_$valueCol"),
        sum("__partial_n").as("n_rows"))
  }

  /** Two-phase salted top-K per key — the skew-proof form of the
    * row_number() quota cut (d21's shape). A plain window partitioned by
    * the key sorts every row of the hot key in ONE task; here phase 1 takes
    * a partial top-K per (key, salt) — the hot key's rows spread over
    * `factor` independent sorted runs — and phase 2 re-ranks only the
    * ≤ K·factor survivors per key. Lossless for any TOTAL `order`: a true
    * top-K row's rank within its salt slice is ≤ its global rank ≤ K, so it
    * always survives phase 1. Output matches the window form: input columns
    * plus `rank` (1-based, in `order`).
    */
  def saltedTopK(df: org.apache.spark.sql.DataFrame, key: String,
                 order: Seq[org.apache.spark.sql.Column], k: Int,
                 factor: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor)))
    val w1 = Window.partitionBy(col(key), col("__salt")).orderBy(order: _*)
    val survivors = salted
      .withColumn("__r1", row_number().over(w1))
      .where(col("__r1") <= k)
      .drop("__r1", "__salt")
    val w2 = Window.partitionBy(col(key)).orderBy(order: _*)
    survivors
      .withColumn("rank", row_number().over(w2).cast("int"))
      .where(col("rank") <= k)
  }
}
