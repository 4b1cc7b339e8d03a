package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the nightly_3dates arm (round 18, guide
  * §1/§6): same-JVM walls for compute (noop), write (recomputes — the
  * sink cost is write − compute), the read-back invariant count, and
  * retention, repeated so JIT warmup is visible. Test-tree main (never
  * moves the src/main stamp):
  *   SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.bench.NightlyPhases'
  */
object NightlyPhases {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dates = Seq("2024-07-15", "2024-07-16", "2024-07-17")
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    (1 to 2).foreach { i =>
      val out = java.nio.file.Files.createTempDirectory("nightly_phases").toString
      val routes = graft.Bench.syntheticRoutes(spark, 168000)
      val acc = graft.Bench.syntheticAccidents(spark, 6900)
      val scores = graft.pipeline.ScoringPipeline.computeDailyScores(routes, acc, dates)
      val tCompute = t(scores.write.format("noop").mode("overwrite").save())
      val tWrite = t(graft.pipeline.ScoringPipeline.writeScores(scores, out))
      var written = 0L
      val tCount = t {
        written = spark.read.parquet(out)
          .where(col("prediction_date").isin(dates.map(java.sql.Date.valueOf): _*))
          .count()
      }
      val tExpected = t(routes.count())
      val tRetain = t(graft.pipeline.ScoringPipeline.retainDates(spark, out, dates))
      val nFiles = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
          else if (f.getName.endsWith(".parquet")) 1L else 0L
        walk(new java.io.File(out))
      }
      println(f"[nightly] run $i: compute $tCompute%.2f write $tWrite%.2f " +
        f"(sink ≈ ${tWrite - tCompute}%.2f) count $tCount%.2f expected $tExpected%.2f " +
        f"retain $tRetain%.2f | rows $written files $nFiles")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(out))
    }
    spark.stop()
  }
}
