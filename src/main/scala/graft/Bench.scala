package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — driver runs this per-round at sf0.1 (BENCH_r{N}.json).
  *
  * Every query is forced through the `noop` sink so the FULL plan executes
  * (a bare `count()` would let Catalyst prune aggregates and join sides).
  * Alongside the suite queries, `kernel_batch_168k` reproduces the
  * reference's nightly batch at its production scale: 168K routes × 6.9K
  * accidents ≈ 1.16B influence-kernel evaluations (BASELINE.md: reference
  * needs 5-15 min per date at that scale, single node).
  */
object Bench {

  /** Synthetic reference-production-scale scoring batch (no file input —
    * the kernel is compute-bound; rows generated with spark.range partition-
    * parallel, exactly like a real routes scan would parallelize).
    */
  def kernelBatch168k(spark: SparkSession): DataFrame = {
    import graft.kernel.SafetyKernel
    val routes = spark.range(168000).select(
      col("id").as("route_id"),
      (lit(35.0) + (col("id") % 1000) / 100.0).as("lat"),
      (lit(-120.0) + (col("id") % 700) / 70.0).as("lon"),
      (lit(1000.0) + (col("id") % 3000)).as("elev"),
      queries_typeName(col("id") % 8).as("route_type"),
      (lit(5.0) + (col("id") % 11)).as("difficulty"))
    val accidents = spark.range(6900).select(
      col("id").as("accident_id"),
      (lit(35.0) + ((col("id") * 37) % 1000) / 100.0).as("a_lat"),
      (lit(-120.0) + ((col("id") * 53) % 700) / 70.0).as("a_lon"),
      (lit(800.0) + ((col("id") * 13) % 3500)).as("a_elev"),
      queries_typeName((col("id") * 31) % 8).as("acc_type"),
      when(col("id") % 3 === 0, "fatal").when(col("id") % 3 === 1, "serious")
        .otherwise("minor").as("severity_raw"),
      date_add(to_date(lit("2024-01-01")), (col("id") % 730).cast("int")).as("a_date"),
      (lit(4.0) + ((col("id") * 7) % 13)).as("a_difficulty"))
    SafetyKernel.scoreRoutes(routes, accidents, to_date(lit("2024-07-15")))
  }

  private def queries_typeName(key: org.apache.spark.sql.Column) = {
    val types = graft.queries.Sql.TypeByIdx
    types.zipWithIndex.dropRight(1)
      .foldLeft(when(lit(false), lit(""))) { case (acc, (t, i)) => acc.when(key === i, t) }
      .otherwise(types.last)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(fn: => DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn.write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = time(fn(spark, sfDir))
    }
    results("kernel_batch_168k") = time(kernelBatch168k(spark))

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
