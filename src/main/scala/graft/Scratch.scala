package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val dir = "/root/testdata/sf0.1"
    t("k10_color_hist") {
      SparkEntry.queries("k10_color_hist")(spark, dir).write.format("noop").mode("overwrite").save()
    }
    t("q01_pricing_summary") {
      SparkEntry.queries("q01_pricing_summary")(spark, dir).write.format("noop").mode("overwrite").save()
    }
    t("kernel_batch_168k") {
      Bench.kernelBatch168k(spark).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
