package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic math as native Catalyst column expressions (whole-stage
  * codegen'd — no UDFs in the kernel hot path).
  *
  * Reference semantics: `backend/app/utils/geo_utils.py:12-99` (haversine with
  * R=6371 km, initial bearing normalized to [0, 360)), vectorized twin at
  * `backend/app/services/safety_algorithm_vectorized.py:44-77`.
  */
object GeoExprs {

  /** Earth radius in km (`backend/app/services/algorithm_config.py:262`). */
  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km between two (lat, lon) points in degrees.
    * `haversine = 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))`
    * (ref: `backend/app/utils/geo_utils.py:12-52`).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    haversineKmHoisted(cos(radians(lat1)), lat1, lon1, cos(radians(lat2)), lat2, lon2)

  /** [[haversineKm]] with the two latitude cosines supplied by the caller.
    * In a pair loop (routes × accidents) each cosine depends on only ONE
    * side, so hoisting them into the side projections saves 2 of the 4
    * per-pair trig calls. Same expression tree shape otherwise —
    * `(c1*c2)*sin²` associates exactly like the inline form, so results
    * are bit-identical and the DuckDB oracle hashes don't move.
    */
  def haversineKmHoisted(cosLat1: Column, lat1: Column, lon1: Column,
                         cosLat2: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) + cosLat1 * cosLat2 * pow(sin(dLon / 2), 2)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Initial great-circle bearing in degrees [0, 360)
    * (ref: `backend/app/utils/geo_utils.py:55-99`).
    */
  def bearingDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val phi1 = radians(lat1)
    val phi2 = radians(lat2)
    val dLon = radians(lon2 - lon1)
    val y = sin(dLon) * cos(phi2)
    val x = cos(phi1) * sin(phi2) - sin(phi1) * cos(phi2) * cos(dLon)
    pmod(degrees(atan2(y, x)), lit(360.0))
  }

  /** Degrees-latitude half-height of a bounding box for a radius in km
    * (ref: `backend/app/utils/geo_utils.py:102-139`). Used only as a cheap
    * prefilter; the exact Gaussian weight is always applied afterwards.
    */
  def bboxLatDelta(radiusKm: Column): Column = radiusKm / lit(111.0)

  /** Degrees-longitude half-width at a given latitude. */
  def bboxLonDelta(radiusKm: Column, lat: Column): Column =
    radiusKm / (lit(111.0) * cos(radians(lat)))

  /** Morton (Z-order) key: quantize lat/lon to `bitsPerDim` bits each and
    * bit-interleave (lon even bits, lat odd). The 100 TB layout use: sort
    * or range-partition a geo table by this key ON WRITE and every file's
    * parquet min/max stats become tight for BOTH coordinates — a plain
    * lat/lon box predicate then skips the files whose stats exclude it
    * (GeoLayoutSpec measures the effect: a small box reads a few files
    * from a z-clustered table vs every file from a hash layout). No read-
    * side change needed; filters stay ordinary range predicates.
    */
  def mortonKey(lat: Column, lon: Column, bitsPerDim: Int = 16): Column = {
    require(bitsPerDim >= 1 && bitsPerDim <= 31, "bitsPerDim must be 1..31")
    val scale = (1L << bitsPerDim) - 1
    val latQ = floor((lat + 90.0) / 180.0 * scale).cast("long")
    val lonQ = floor((lon + 180.0) / 360.0 * scale).cast("long")
    (0 until bitsPerDim).map { i =>
      val latBit = shiftright(latQ, i).bitwiseAND(lit(1L))
      val lonBit = shiftright(lonQ, i).bitwiseAND(lit(1L))
      shiftleft(latBit, 2 * i + 1).bitwiseOR(shiftleft(lonBit, 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB twin of [[mortonKey]] — generated from the same scale and
    * quantization constants so the k21 oracle re-derives the interleave
    * bit-for-bit (disjoint bit positions let `+` stand in for `|`).
    * Emits a SELECT-list expression over `latExpr`/`lonExpr`.
    */
  def mortonKeySql(latExpr: String, lonExpr: String, bitsPerDim: Int = 16): String = {
    require(bitsPerDim >= 1 && bitsPerDim <= 31, "bitsPerDim must be 1..31")
    val scale = (1L << bitsPerDim) - 1
    val latQ = s"CAST(floor(($latExpr + 90.0) / 180.0 * $scale) AS BIGINT)"
    val lonQ = s"CAST(floor(($lonExpr + 180.0) / 360.0 * $scale) AS BIGINT)"
    s"""CAST(list_sum(list_transform(generate_series(0, ${bitsPerDim - 1}),
       |  j -> ((($latQ >> j) & 1) << (2*j + 1))
       |     + ((($lonQ >> j) & 1) << (2*j)))) AS BIGINT)""".stripMargin
  }
}
