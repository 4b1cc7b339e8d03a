package graft.kernel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Factorization semantics of the location-grain batch kernel. */
class LocationKernelSpec extends SparkSpec {

  import spark.implicits._

  private def locations: DataFrame = Seq(
    (10L, 40.0, -105.0, Some(2000.0), "alpine"),
    (20L, 44.0, -110.0, Some(1500.0), "sport"))
    .toDF("location_id", "loc_lat", "loc_lon", "loc_elev", "loc_type")

  private def accidents: DataFrame = Seq(
    (1, 40.05, -105.05, Some(2100.0), "alpine", "fatal", "2024-06-01", Some(7.0)),
    (2, 44.01, -110.02, Some(1400.0), "sport", "serious", "2024-05-01", Some(9.0)))
    .toDF("accident_id", "a_lat", "a_lon", "a_elev", "acc_type", "severity_raw", "d", "a_difficulty")
    .withColumn("a_date", to_date(col("d"))).drop("d")

  private def routes: DataFrame = Seq(
    (1L, 10L, "alpine", Some(7.0)),  // same location, same type+grade as 2
    (2L, 10L, "alpine", Some(7.0)),
    (3L, 10L, "boulder", Some(7.0)), // same location, different type
    (4L, 20L, "alpine", Some(7.0)))  // different location
    .toDF("route_id", "location_id", "route_type", "difficulty")

  private lazy val scored =
    LocationKernel.scoreRoutesViaLocations(routes, locations, accidents,
      to_date(lit("2024-07-15")))
      .collect().map(r => r.getAs[Long]("route_id") ->
        (r.getAs[Double]("risk_score"), r.getAs[String]("color_code"))).toMap

  test("routes sharing location+type+grade share the exact score") {
    assert(scored(1L) == scored(2L))
  }

  test("route-type adjustment differentiates co-located routes") {
    // alpine accident at the location: (alpine,alpine)=1.0 vs (boulder,alpine)<1
    assert(scored(3L)._1 < scored(1L)._1)
  }

  test("kernel factors come from the LOCATION, not the route") {
    // route 4 sits at the distant sport location → only the far sport
    // accident contributes meaningfully; its risk differs from location 10's
    assert(scored(4L)._1 != scored(1L)._1)
    assert(scored.values.forall { case (r, _) => r >= 0.0 && r <= 100.0 })
  }

  test("batch color thresholds (25/50/75) are applied") {
    assert(scored.values.forall { case (r, c) =>
      c == (if (r < 25) "green" else if (r < 50) "yellow"
        else if (r < 75) "orange" else "red")
    })
  }
}
