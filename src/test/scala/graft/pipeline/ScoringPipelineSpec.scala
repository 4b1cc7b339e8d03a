package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScoringPipelineSpec extends SparkSpec {

  import spark.implicits._

  private def routes: DataFrame = Seq(
    (1L, 40.0, -105.0, Some(3000.0), "alpine", Some(10.0)),
    (2L, 40.5, -105.5, Some(2000.0), "sport", Some(12.0)))
    .toDF("route_id", "lat", "lon", "elev", "route_type", "difficulty")

  private def accidents: DataFrame = Seq(
    (1, 40.1, -105.0, Some(2900.0), "alpine", "fatal", "2023-07-15", Some(9.0)))
    .toDF("accident_id", "a_lat", "a_lon", "a_elev", "acc_type", "severity_raw", "d", "a_difficulty")
    .withColumn("a_date", to_date(col("d"))).drop("d")

  test("runDaily writes date partitions, invariant holds, rerun is idempotent") {
    val out = Files.createTempDirectory("scores").toString
    val dates = Seq("2024-07-15", "2024-07-16", "2024-07-17")
    val written = ScoringPipeline.runDaily(spark, routes, accidents, dates, out)
    assert(written == routes.count() * 3)

    // partition layout on disk
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == dates.map(d => s"prediction_date=$d"))

    // re-running one date must replace only that partition (same row count)
    ScoringPipeline.writeScores(
      ScoringPipeline.computeDailyScores(routes, accidents, Seq("2024-07-16")), out)
    val after = spark.read.parquet(out)
    assert(after.count() == routes.count() * 3)
    // still one row per (route, date)
    assert(after.groupBy("route_id", "prediction_date").count()
      .where(col("count") > 1).count() == 0)
  }

  test("retainDates drops exactly the non-kept partitions") {
    val out = Files.createTempDirectory("scores").toString
    val dates = Seq("2024-07-15", "2024-07-16", "2024-07-17")
    ScoringPipeline.runDaily(spark, routes, accidents, dates, out)
    val dropped = ScoringPipeline.retainDates(spark, out, keep = Seq("2024-07-16", "2024-07-17"))
    assert(dropped == Seq("prediction_date=2024-07-15"))
    val remaining = spark.read.parquet(out)
      .select("prediction_date").distinct().as[java.sql.Date].collect().map(_.toString).sorted
    assert(remaining.toSeq == Seq("2024-07-16", "2024-07-17"))
  }

  test("scores at the cluster beat scores far away (sanity of the batch output)") {
    val out = Files.createTempDirectory("scores").toString
    ScoringPipeline.runDaily(spark, routes, accidents, Seq("2024-07-15"), out)
    val scores = spark.read.parquet(out)
      .select("route_id", "risk_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L)) // route 1 sits at the accident
  }

  test("mergeScores: row-grain upsert touches only updated keys/partitions") {
    val out = Files.createTempDirectory("merge-scores").toString
    ScoringPipeline.runDaily(spark, routes, accidents,
      Seq("2024-07-15", "2024-07-16"), out)

    // update ONE route on ONE date
    // localCheckpoint: the update frame must not lazily re-read the target
    // files after the merge rewrites them
    val update = spark.read.parquet(out)
      .where(col("route_id") === 1L && col("prediction_date") === "2024-07-15")
      .withColumn("risk_score", lit(99.0))
      .withColumn("color_code", lit("red"))
      .localCheckpoint()
    ScoringPipeline.mergeScores(spark, update, out)

    val after = spark.read.parquet(out)
    assert(after.count() == 4) // still 2 routes x 2 dates — upsert, not append
    val k = after.select("route_id", "prediction_date", "risk_score").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    assert(k((1L, "2024-07-15")) == 99.0)
    assert(k((2L, "2024-07-15")) != 99.0) // untouched row of the same partition
    assert(k((1L, "2024-07-16")) != 99.0) // untouched partition
    // merging a brand-new key inserts it
    val newRow = update
      .withColumn("route_id", lit(7L)).withColumn("risk_score", lit(1.0))
    ScoringPipeline.mergeScores(spark, newRow, out)
    assert(spark.read.parquet(out).count() == 5)
  }
}
