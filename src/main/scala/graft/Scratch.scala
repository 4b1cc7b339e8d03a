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
    for (q <- Seq("d05_minhash_lsh", "d05_minhash_lsh", "d07_embedding_neardup", "d07_embedding_neardup", "d09_embedding_lsh_neardup", "d09_embedding_lsh_neardup")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      println(s"$q: ${(System.nanoTime() - t0) / 1e9} s")
    }
    spark.stop()
  }
}
