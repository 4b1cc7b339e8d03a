package graft

import org.apache.spark.sql.SparkSession

/** Dev-only exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val routes = graft.queries.Derived.routes(spark, dir)
    val accidents = graft.queries.Derived.accidents(spark, dir)
    println("routes=" + routes.count() + " accidents=" + accidents.count())
    val t0 = System.nanoTime()
    graft.Bench.kernelBatch168kPruned(spark).write.format("noop").mode("overwrite").save()
    println(s"pruned168k: ${(System.nanoTime() - t0) / 1e9} s")
    val t1 = System.nanoTime()
    graft.Bench.kernelBatch168kPruned(spark).write.format("noop").mode("overwrite").save()
    println(s"pruned168k: ${(System.nanoTime() - t1) / 1e9} s")
    spark.stop()
  }
}
