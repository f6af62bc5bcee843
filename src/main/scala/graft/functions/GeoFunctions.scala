package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic distance as pure Column math.
  *
  * Replaces the reference's Python scalar UDF (`geopy.distance.geodesic`,
  * query4.py:9-10) with a haversine great-circle formula built from
  * codegen'd built-ins — no serialization boundary, fully inside
  * whole-stage codegen, and expressible 1:1 in the DuckDB oracle.
  * (Haversine ≈ sphere vs geopy's Karney ellipsoid — SURVEY.md §7.4 calls
  * out that oracle parity matters more than matching geopy's constants.)
  */
object GeoFunctions {
  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * arguments in degrees. Double math end-to-end (the reference's float32
    * UDF round-trip caused visible jitter, results/query4.txt:4 vs :29). */
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Scalar twin for typed-Dataset closures — same java.lang.Math calls the
    * Column version codegens to, so both paths agree bit-for-bit. */
  def haversineKmScalar(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    import java.lang.Math._
    val dLat = toRadians(lat2 - lat1) / 2
    val dLon = toRadians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(toRadians(lat1)) * cos(toRadians(lat2)) * pow(sin(dLon), 2)
    2.0 * EarthRadiusKm * asin(sqrt(a))
  }
}
