package graft

import org.apache.spark.sql.SparkSession

/** Dev-only exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[scratch] $name ok ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"[scratch] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
    // scripts smoke-testing the suite must see breakage in the exit code,
    // not just a FAILED line buried in the log
    if (failed > 0) sys.exit(1)
  }
}
