package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All tables are parquet with fixed, driver-written schemas; we read them
  * as-is (no inferSchema — parquet is self-describing). Column pruning and
  * predicate pushdown happen automatically downstream because every query
  * builds a declarative plan on top of these scans.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has been written two ways across testdata generations:
    * parquet TIMESTAMP(MICROS) (reads as a plain TimestampType) and
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). We adapt to whichever the file declares
    * instead of hard-coding one generation's physical type: with
    * `nanosAsLong` set, a NANOS column surfaces as LongType, which we
    * truncate to micros with integer division (`div`, not `/` — double
    * arithmetic would lose precision on epoch-nanos magnitudes). DuckDB
    * performs the identical ns→us truncation, so oracle SQL sees the same
    * instants either way. A MICROS column surfaces as TimestampType and is
    * used as written.
    *
    * SIDE EFFECT: `nanosAsLong` is a SESSION conf consulted at scan
    * planning, so it stays set after this call — other TIMESTAMP(NANOS)
    * parquet reads in the session will also get raw longs instead of the
    * loud [PARQUET_TYPE_ILLEGAL]. Scoping it set/restore would race the
    * lazy plan, so it is deliberately left session-wide; the only NANOS
    * table in this engine's surface is `events`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000L")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // isAdjustedToUTC=false parquet reads as NTZ; every session in this
        // engine pins spark.sql.session.timeZone=UTC, so the cast keeps the
        // same wall-clock instants DuckDB sees reading the file naively.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
