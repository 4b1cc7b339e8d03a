package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (getOrCreate — one session per
  * forked test JVM; build.sbt disables parallel execution).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Evaluate a literal-only Column expression to a single value. */
  def evalDouble(c: Column): Double = {
    val row = spark.range(1).select(c.cast("double").as("v")).head()
    assert(!row.isNullAt(0), s"expression evaluated to null: $c")
    row.getDouble(0)
  }

  def evalString(c: Column): String =
    spark.range(1).select(c.as("v")).head().getString(0)

  def evalNullable(c: Column): Option[Double] = {
    val row = spark.range(1).select(c.cast("double").as("v")).head()
    if (row.isNullAt(0)) None else Some(row.getDouble(0))
  }

  def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean = math.abs(a - b) <= tol

  override def afterAll(): Unit = {
    // keep the shared session alive across suites; sbt kills the fork at end
    super.afterAll()
  }
}
