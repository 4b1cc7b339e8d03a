package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-only probe: split driver-side planning from execution for one
  * bench shape (used to bisect the round-17 pruned-kernel plan changes on
  * the 168k arm). Not part of the library surface.
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
    (1 to 2).foreach { i =>
      val df = graft.Bench.kernelBatch168kPruned(spark)
      val t0 = System.nanoTime()
      df.queryExecution.executedPlan // analysis + optimization + physical planning
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[plantime] run $i: plan ${(t1 - t0) / 1e9}%.2f s, exec ${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
