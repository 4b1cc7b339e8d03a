package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe: split driver-side planning from execution for selected
  * bench shapes (used to bisect round-17 plan changes). Not part of the
  * library surface. Usage: `runMain graft.bench.PlanTime [shape ...]`.
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.sim.Similarity
    val cb = Similarity.pqFixedCodebooks(dim = 64, numSub = 8, ksub = 4)
    def e1m = graft.Bench.syntheticEmbeddings(spark, 1000000L)
    def corpusCodes = graft.Partitioning.balanced(
      e1m.where(col("vec_id") >= 40).select(col("vec_id").as("neighbor_id"),
        Similarity.pqEncode(col("embedding").cast("array<double>"), cb).as("codes")))
    def luts = broadcast(e1m.where(col("vec_id") < 40)
      .select(col("vec_id").as("query_id"),
        Similarity.pqAdcLut(col("embedding").cast("array<double>"), cb).as("lut")))

    val shapes: Map[String, () => DataFrame] = Map(
      "kernel168kp" -> (() => graft.Bench.kernelBatch168kPruned(spark)),
      "pq1m_full" -> (() => graft.Bench.annPq1m(spark)),
      "pq1m_encode" -> (() => graft.Bench.annEncode(spark, 1000000L)),
      "pq1m_scoreonly" -> (() => luts.crossJoin(corpusCodes)
        .select(col("query_id"), col("neighbor_id"),
          graft.expr.PqExprs.adcScore(col("codes"), col("lut"), lit(0.0),
            cb.numSub, cb.ksub).as("score"))),
      "pq1m_pairsonly" -> (() => luts.crossJoin(corpusCodes)
        .select(col("query_id"), col("neighbor_id"))),
      "ivfpq1m_full" -> (() => graft.Bench.annIvfPq1m(spark)),
      // nightly decomposition: fused multi-date compute vs the per-date
      // union form it replaced (compute only, no write)
      "nightly_fused" -> (() => graft.pipeline.ScoringPipeline.computeDailyScores(
        graft.Bench.syntheticRoutes(spark, 168000),
        graft.Bench.syntheticAccidents(spark, 6900),
        Seq("2024-07-15", "2024-07-16", "2024-07-17"))),
      "nightly_perdate" -> (() => Seq("2024-07-15", "2024-07-16", "2024-07-17").map { d =>
        graft.kernel.SafetyKernel.scoreRoutes(
            graft.Bench.syntheticRoutes(spark, 168000),
            graft.Bench.syntheticAccidents(spark, 6900), to_date(lit(d)))
          .withColumn("prediction_date", to_date(lit(d)))
          .withColumn("calculated_at", current_timestamp())
      }.reduce(_ unionByName _)))

    val wanted = if (args.nonEmpty) args.toSeq else Seq("kernel168kp")
    wanted.foreach { name =>
      (1 to 2).foreach { i =>
        val df = shapes(name)()
        val t0 = System.nanoTime()
        df.queryExecution.executedPlan
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"[plantime] $name run $i: plan ${(t1 - t0) / 1e9}%.2f s, exec ${(t2 - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
