package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

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
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // quarter scale for iteration: 42000 × 6900 = 290M pairs
    val routes = spark.range(42000).select(
      col("id").as("route_id"),
      (lit(35.0) + (col("id") % 1000) / 100.0).as("lat"),
      (lit(-120.0) + (col("id") % 700) / 70.0).as("lon"),
      (lit(1000.0) + (col("id") % 3000)).as("elev"),
      (lit(5.0) + (col("id") % 11)).as("difficulty"),
      lit(75.0).as("__h"), lit(0.9998).as("__lam"), lit(1600.0).as("__elev_c"),
      (col("id") % 7).cast("int").as("__rt_idx"))
    val accidents = spark.range(6900).select(
      col("id").as("accident_id"),
      (lit(35.0) + ((col("id") * 37) % 1000) / 100.0).as("a_lat"),
      (lit(-120.0) + ((col("id") * 53) % 700) / 70.0).as("a_lon"),
      (lit(800.0) + ((col("id") * 13) % 3500)).as("a_elev"),
      (lit(4.0) + ((col("id") * 7) % 13)).as("a_difficulty"),
      lit(1.1).as("__sev_w"), ((col("id") * 31) % 7).cast("int").as("__acc_idx"),
      (col("id") % 700).cast("double").as("__days"),
      (col("id") % 2 === 0).as("__same_season"))
    val pairs = routes.crossJoin(broadcast(accidents))

    val hav = lit(2.0 * 6371) * asin(sqrt(
      pow(sin(radians(col("a_lat") - col("lat")) / 2), 2) +
        cos(radians(col("lat"))) * cos(radians(col("a_lat"))) *
          pow(sin(radians(col("a_lon") - col("lon")) / 2), 2)))
    val spatial = exp(-(pow(hav, 2)) / (lit(2.0) * pow(col("__h"), 2)))
    val baseDecay = pow(col("__lam"), col("__days"))
    val temporal = when(col("__same_season"),
      (lit(1.0) - lit(0.35) * (lit(1.0) - pow(baseDecay, 1.5))) * 1.05)
      .otherwise(lit(1.0) - lit(0.35) * (lit(1.0) - pow(baseDecay, 1.5)))
    val elevW = lit(1.0) + lit(0.15) * exp(-pow(abs(col("a_elev") - col("elev")) / col("__elev_c"), 2))
    val grW = greatest(lit(0.25), exp(-pow(abs(col("difficulty") - col("a_difficulty")), 2) / 12.9))
    val rtArr = array((1 to 49).map(i => lit(i / 49.0)): _*)
    val rtW = element_at(rtArr, (col("__rt_idx") * 7 + col("__acc_idx") + 1).cast("int"))

    def run(name: String, influence: Column): Unit = t(name) {
      pairs.select(col("route_id"), influence.as("influence"))
        .groupBy("route_id").agg(sum("influence"))
        .write.format("noop").mode("overwrite").save()
    }

    def realPairs = {
      val r = spark.range(168000).select(
        col("id").as("route_id"),
        (lit(35.0) + (col("id") % 1000) / 100.0).as("lat"),
        (lit(-120.0) + (col("id") % 700) / 70.0).as("lon"),
        (lit(1000.0) + (col("id") % 3000)).as("elev"),
        when(col("id") % 8 === 0, "alpine").when(col("id") % 8 === 1, "ice")
          .when(col("id") % 8 === 2, "mixed").when(col("id") % 8 === 3, "trad")
          .when(col("id") % 8 === 4, "sport").when(col("id") % 8 === 5, "aid")
          .when(col("id") % 8 === 6, "boulder").otherwise("trad").as("route_type"),
        (lit(5.0) + (col("id") % 11)).as("difficulty"))
      val a = spark.range(6900).select(
        col("id").as("accident_id"),
        (lit(35.0) + ((col("id") * 37) % 1000) / 100.0).as("a_lat"),
        (lit(-120.0) + ((col("id") * 53) % 700) / 70.0).as("a_lon"),
        (lit(800.0) + ((col("id") * 13) % 3500)).as("a_elev"),
        when(col("id") % 8 === 0, "alpine").otherwise("sport").as("acc_type"),
        lit("serious").as("severity_raw"),
        date_add(to_date(lit("2024-01-01")), (col("id") % 730).cast("int")).as("a_date"),
        (lit(4.0) + ((col("id") * 7) % 13)).as("a_difficulty"))
      graft.kernel.SafetyKernel.pairInfluence(r, a, to_date(lit("2024-07-15")))
    }
    t("two-sum agg (scoreRoutes)") {
      graft.kernel.SafetyKernel.scoreRoutes(realPairs)
        .write.format("noop").mode("overwrite").save()
    }
    t("two-sum agg, pre-projected") {
      realPairs.select(col("route_id"), col("influence"))
        .groupBy("route_id")
        .agg(sum("influence").as("s"),
          sum(when(col("influence") > 1e-6, 1L).otherwise(0L)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    // real pairInfluence but aggregating only influence (single reference)
    t("real pairs, single-sum agg") {
      val r = spark.range(168000).select(
        col("id").as("route_id"),
        (lit(35.0) + (col("id") % 1000) / 100.0).as("lat"),
        (lit(-120.0) + (col("id") % 700) / 70.0).as("lon"),
        (lit(1000.0) + (col("id") % 3000)).as("elev"),
        when(col("id") % 8 === 0, "alpine").when(col("id") % 8 === 1, "ice")
          .when(col("id") % 8 === 2, "mixed").when(col("id") % 8 === 3, "trad")
          .when(col("id") % 8 === 4, "sport").when(col("id") % 8 === 5, "aid")
          .when(col("id") % 8 === 6, "boulder").otherwise("trad").as("route_type"),
        (lit(5.0) + (col("id") % 11)).as("difficulty"))
      val a = spark.range(6900).select(
        col("id").as("accident_id"),
        (lit(35.0) + ((col("id") * 37) % 1000) / 100.0).as("a_lat"),
        (lit(-120.0) + ((col("id") * 53) % 700) / 70.0).as("a_lon"),
        (lit(800.0) + ((col("id") * 13) % 3500)).as("a_elev"),
        when(col("id") % 8 === 0, "alpine").otherwise("sport").as("acc_type"),
        lit("serious").as("severity_raw"),
        date_add(to_date(lit("2024-01-01")), (col("id") % 730).cast("int")).as("a_date"),
        (lit(4.0) + ((col("id") * 7) % 13)).as("a_difficulty"))
      graft.kernel.SafetyKernel.pairInfluence(r, a, to_date(lit("2024-07-15")))
        .select(col("route_id"), col("influence"))
        .groupBy("route_id").agg(sum("influence"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
