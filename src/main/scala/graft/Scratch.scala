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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val out = new StringBuilder
    for (n <- Tables.names) {
      out ++= s"=== $n\n"
      out ++= Tables.load(spark, dir, n).schema.treeString
    }
    out ++= "=== events fixed\n"
    out ++= Tables.events(spark, dir).schema.treeString
    out ++= Tables.events(spark, dir).limit(3).collect().mkString("\n")
    out ++= "\n=== region rows\n"
    out ++= Tables.region(spark, dir).collect().mkString("\n")
    out ++= "\n=== mktsegments\n"
    out ++= Tables.customer(spark, dir).select("c_mktsegment").distinct().collect().mkString(",")
    out ++= "\n=== event types\n"
    out ++= Tables.events(spark, dir).select("event_type").distinct().collect().mkString(",")
    out ++= "\n=== langs\n"
    out ++= Tables.documents(spark, dir).select("lang").distinct().collect().mkString(",")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/scratch.out"), out.toString)
    spark.stop()
  }
}
