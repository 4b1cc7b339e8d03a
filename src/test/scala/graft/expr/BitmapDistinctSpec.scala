package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom TypedImperativeAggregate: exact vs countDistinct, cross-
  * partition merge (serialize/deserialize path), null skipping, the
  * out-of-range contract, and the SQL surface.
  */
class BitmapDistinctSpec extends SparkSpec {

  import BitmapDistinct.bitmapDistinct

  test("matches countDistinct exactly, across a forced repartition") {
    val df = spark.range(5000).select(
      (col("id") % 7).as("g"), ((col("id") * 37) % 991).as("uid"))
      .repartition(13) // partial buffers must serialize + OR-merge
    val got = df.groupBy("g").agg(bitmapDistinct(col("uid"), 1024).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = df.groupBy("g").agg(countDistinct("uid").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
    assert(got.values.sum > 0)
  }

  test("nulls are skipped; empty group yields 0") {
    val df = spark.range(10).select(
      lit(1L).as("g"),
      when(col("id") % 2 === 0, col("id")).otherwise(lit(null)).as("uid"))
    val n = df.groupBy("g").agg(bitmapDistinct(col("uid"), 64).as("n"))
      .head().getLong(1)
    assert(n == 5)
    val empty = spark.range(1).where(lit(false))
      .select(col("id").as("uid"))
      .agg(bitmapDistinct(col("uid"), 64).as("n")).head().getLong(0)
    assert(empty == 0L)
  }

  test("ids outside [0, maxId) throw rather than silently corrupt") {
    val ex = intercept[Exception] {
      spark.range(10).select(col("id").as("uid"))
        .agg(bitmapDistinct(col("uid"), 5).as("n")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null)
      && causes(ex).exists(c => Option(c.getMessage).exists(_.contains("outside"))))
  }

  test("SQL surface: bitmap_distinct(col, literal) aggregates") {
    graft.sql.GraftFunctions.register(spark)
    spark.range(100).select((col("id") % 3).as("g"), (col("id") % 41).as("uid"))
      .createOrReplaceTempView("bd_t")
    val rows = spark.sql(
      "SELECT g, bitmap_distinct(uid, 64) AS n FROM bd_t GROUP BY g ORDER BY g")
      .collect()
    val exp = spark.sql(
      "SELECT g, count(DISTINCT uid) AS n FROM bd_t GROUP BY g ORDER BY g")
      .collect()
    assert(rows.map(_.getLong(1)).toSeq == exp.map(_.getLong(1)).toSeq)
  }
}
