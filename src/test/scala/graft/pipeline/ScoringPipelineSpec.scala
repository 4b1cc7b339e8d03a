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

  test("multi-date kernel == per-date kernels, bitwise (shared-geometry fusion)") {
    // the round-17 fusion (SafetyKernel.scoreRoutesForDates) computes the
    // date-independent pair geometry once below the date fan-out; this arm
    // pins BIT-equality of every output value against the per-date form it
    // replaced — on a denser grid than the shared fixtures so several
    // routes, types, seasons and null windows are all represented
    val rts = spark.range(200).select(
      col("id").as("route_id"),
      (lit(39.0) + (col("id") % 50) / 25.0).as("lat"),
      (lit(-106.0) + (col("id") % 40) / 20.0).as("lon"),
      when(col("id") % 7 === 0, lit(null).cast("double"))
        .otherwise(lit(1500.0) + (col("id") % 2000)).as("elev"),
      when(col("id") % 4 === 0, "alpine").when(col("id") % 4 === 1, "sport")
        .when(col("id") % 4 === 2, "trad").otherwise("ice").as("route_type"),
      when(col("id") % 5 === 0, lit(null).cast("double"))
        .otherwise(lit(5.0) + (col("id") % 11)).as("difficulty"))
    val accs = spark.range(300).select(
      col("id").as("accident_id"),
      (lit(39.0) + ((col("id") * 37) % 50) / 25.0).as("a_lat"),
      (lit(-106.0) + ((col("id") * 53) % 40) / 20.0).as("a_lon"),
      (lit(1400.0) + ((col("id") * 13) % 2200)).as("a_elev"),
      when(col("id") % 3 === 0, "alpine").when(col("id") % 3 === 1, "sport")
        .otherwise("trad").as("acc_type"),
      when(col("id") % 3 === 0, "fatal").when(col("id") % 3 === 1, "serious")
        .otherwise("minor").as("severity_raw"),
      date_add(to_date(lit("2023-01-01")), (col("id") % 900).cast("int")).as("a_date"),
      (lit(4.0) + ((col("id") * 7) % 13)).as("a_difficulty"))
    // dates spanning a season boundary so __same_season differs per date
    val dates = Seq("2024-07-15", "2024-09-23", "2024-12-05")
    def rows(df: DataFrame): Seq[String] =
      df.select(col("route_id"), col("prediction_date"), col("total_influence"),
          col("n_contributing"), col("risk_score"), col("color_code"))
        .orderBy("prediction_date", "route_id")
        .collect().map(_.toString).toSeq
    val fused = rows(graft.kernel.SafetyKernel.scoreRoutesForDates(rts, accs, dates))
    val perDate = rows(dates.map { d =>
      graft.kernel.SafetyKernel.scoreRoutes(rts, accs, to_date(lit(d)))
        .withColumn("prediction_date", to_date(lit(d)))
    }.reduce(_ unionByName _))
    assert(fused.size == 200 * 3)
    assert(fused == perDate) // exact string equality = bit-equal doubles
  }

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

  test("crashed-write debris: rerunning a date converges to the clean table") {
    // The idempotency CLAIM (writeScores scaladoc: "re-running a date
    // replaces exactly that date's partition") exercised through failure
    // injection, not just asserted: simulate a mid-write kill by planting
    // the debris a crashed job leaves behind — a stale `_temporary`
    // staging tree at the table root AND a partial orphan file inside the
    // victim date's partition (task-committed output whose job never
    // committed) — then rerun that ONE date and require the final table
    // to equal a clean single run, byte-debris gone.
    val dates = Seq("2024-07-15", "2024-07-16", "2024-07-17")
    def deterministic(path: String) = spark.read.parquet(path)
      .select(col("route_id"), col("prediction_date"),
        round(col("risk_score"), 9).as("risk_score"),
        col("n_contributing"), col("color_code"))
      .orderBy("prediction_date", "route_id")
      .collect().toSeq

    val clean = Files.createTempDirectory("scores_clean").toString
    ScoringPipeline.writeScores(
      ScoringPipeline.computeDailyScores(routes, accidents, dates), clean)
    val want = deterministic(clean)

    val out = Files.createTempDirectory("scores_crash").toString
    ScoringPipeline.writeScores(
      ScoringPipeline.computeDailyScores(routes, accidents, dates), out)
    // crash debris 1: stale staging tree from a killed job
    val tmp = new java.io.File(out, "_temporary/0/_temporary/attempt_dead/")
    assert(tmp.mkdirs())
    Files.write(tmp.toPath.resolve("part-00000-dead.snappy.parquet"),
      Array[Byte](0x50, 0x41, 0x52, 0x31)) // "PAR1" and nothing else
    // crash debris 2: orphan partial file INSIDE the victim partition —
    // not valid parquet, so if the rerun fails to remove it the final
    // read below fails loudly instead of silently passing
    val victim = new java.io.File(out, "prediction_date=2024-07-16")
    assert(victim.isDirectory)
    val orphan = new java.io.File(victim, "part-99999-crashed.c000.snappy.parquet")
    Files.write(orphan.toPath, "not parquet at all".getBytes)

    // the recovery a scheduler would do: rerun the victim date only
    ScoringPipeline.writeScores(
      ScoringPipeline.computeDailyScores(routes, accidents, Seq("2024-07-16")), out)

    assert(!orphan.exists(),
      "dynamic partition overwrite left the crashed partial file in place")
    assert(deterministic(out) == want,
      "post-crash rerun does not converge to the clean single-run table")
    // and the UNTOUCHED dates survived the single-date rerun — the
    // property a static-overwrite regression (mutation arm M24) destroys:
    // static mode truncates the whole table and leaves only the rerun date
    val remainingDates = spark.read.parquet(out)
      .select("prediction_date").distinct().count()
    assert(remainingDates == 3L,
      "rerunning one date disturbed the other dates' partitions")
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

  test("exportScores: JSONL/CSV round-trip preserves schema and values") {
    val dates = Seq("2024-07-15", "2024-07-16")
    val scores = ScoringPipeline.computeDailyScores(routes, accidents, dates)
      .drop("calculated_at") // timestamp precision differs per text format
    val want = scores
      .select("route_id", "prediction_date", "risk_score", "n_contributing", "color_code")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r).toMap
    for (fmt <- Seq("json", "csv")) {
      val out = Files.createTempDirectory(s"export-$fmt").toString
      ScoringPipeline.exportScores(scores, out, fmt)
      // date-partitioned layout, like the parquet sink
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
      assert(dirs.toSeq == dates.map(d => s"prediction_date=$d"), s"$fmt layout")
      val back = ScoringPipeline.readExport(spark, out, fmt, scores.schema)
        .select("route_id", "prediction_date", "risk_score", "n_contributing", "color_code")
        .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r).toMap
      assert(back.keySet == want.keySet, s"$fmt keys")
      want.foreach { case (k, w) =>
        val b = back(k)
        assert(math.abs(b.getDouble(2) - w.getDouble(2)) < 1e-9, s"$fmt risk @ $k")
        assert(b.getLong(3) == w.getLong(3) && b.getString(4) == w.getString(4), s"$fmt @ $k")
      }
    }
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

  test("applyAccidentDelta == full recompute after new accidents arrive") {
    val dir = "/root/testdata/sf0.001"
    val routes = graft.queries.Derived.routes(spark, dir)
    val acc = graft.queries.Derived.accidents(spark, dir)
    val oldAcc = acc.where(col("accident_id") % 5 =!= 0)
    val newAcc = acc.where(col("accident_id") % 5 === 0)
    assert(newAcc.count() > 0 && oldAcc.count() > 0)
    val planDate = graft.queries.Derived.planDate

    val incr = ScoringPipeline.applyAccidentDelta(
      graft.kernel.SafetyKernel.scoreRoutes(routes, oldAcc, planDate),
      routes, newAcc, planDate)
      .select("route_id", "total_influence", "n_contributing", "risk_score", "color_code")
      .collect().map(r => r.getLong(0) -> r).toMap
    val full = graft.kernel.SafetyKernel.scoreRoutes(routes, acc, planDate)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(incr.keySet == full.keySet)
    full.foreach { case (id, f) =>
      val i = incr(id)
      // float sums differ only in association order → ulp-level tolerance
      assert(math.abs(i.getAs[Double]("risk_score") - f.getAs[Double]("risk_score")) < 1e-9,
        s"risk mismatch route $id")
      assert(i.getAs[Long]("n_contributing") == f.getAs[Long]("n_contributing"))
      assert(i.getAs[String]("color_code") == f.getAs[String]("color_code"))
    }
  }

  test("applyAccidentDelta on a multi-date table updates only the plan date") {
    val newAcc = Seq(
      (2, 40.2, -105.1, Some(2800.0), "alpine", "serious", "2024-06-01", Some(9.5)))
      .toDF("accident_id", "a_lat", "a_lon", "a_elev", "acc_type", "severity_raw", "d", "a_difficulty")
      .withColumn("a_date", to_date(col("d"))).drop("d")
    val dates = Seq("2024-07-15", "2024-07-16")
    val multi = ScoringPipeline.computeDailyScores(routes, accidents, dates)
    val updated = ScoringPipeline.applyAccidentDelta(
      multi, routes, newAcc, to_date(lit("2024-07-15")))
      .select(col("route_id"), col("prediction_date").cast("string").as("d"),
        col("risk_score"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val before = multi
      .select(col("route_id"), col("prediction_date").cast("string").as("d"),
        col("risk_score"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    routes.select("route_id").collect().map(_.getLong(0)).foreach { id =>
      // pre-fix, the route-only join added the 07-15 delta to BOTH dates
      assert(updated((id, "2024-07-16")) == before((id, "2024-07-16")),
        s"route $id: other date's score was touched")
      assert(updated((id, "2024-07-15")) > before((id, "2024-07-15")),
        s"route $id: plan date did not absorb the delta")
    }
    // and the plan-date rows equal a full recompute with both accidents
    val full = graft.kernel.SafetyKernel.scoreRoutes(
      routes, accidents.unionByName(newAcc), to_date(lit("2024-07-15")))
      .select("route_id", "risk_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    full.foreach { case (id, r) =>
      assert(math.abs(updated((id, "2024-07-15")) - r) < 1e-9, s"route $id")
    }
  }

  test("pruned delta touches only routes near the new accident") {
    import spark.implicits._
    val routes = (1L to 500L).map { i =>
      (i, 35.0 + (i % 100) * 0.2, -120.0 + (i / 100) * 0.5,
        Some(1500.0), "trad", Some(7.0))
    }.toDF("route_id", "lat", "lon", "elev", "route_type", "difficulty")
    val newAcc = Seq((1L, 35.0, -120.0, Some(1500.0), "trad", "serious",
      java.sql.Date.valueOf("2024-06-01"), Some(7.0)))
      .toDF("accident_id", "a_lat", "a_lon", "a_elev", "acc_type", "severity_raw",
        "a_date", "a_difficulty")
    val delta = graft.kernel.KernelPruning.scoreRoutesPruned(
      routes, newAcc, graft.queries.Derived.planDate)
    // one localized accident must not influence the whole route table
    // (far routes keep a zero-delta row — the scoring contract — but only
    // in-radius routes carry actual influence)
    val touched = delta.where(col("total_influence") > 0).count()
    assert(touched > 0 && touched < 500, s"pruned delta touched $touched of 500")
  }
}
