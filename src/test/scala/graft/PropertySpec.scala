package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.GeoFunctions

/** Property-based checks (scalacheck) on the pure scalar kernels — no
  * SparkSession needed, so these run fast and wide. */
class PropertySpec extends AnyFunSuite {

  private val lat = Gen.choose(-89.0, 89.0)
  private val lon = Gen.choose(-179.0, 179.0)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("haversine is symmetric, non-negative, bounded by half circumference") {
    check(Prop.forAll(lat, lon, lat, lon) { (a1, o1, a2, o2) =>
      val d = GeoFunctions.haversineKmScalar(a1, o1, a2, o2)
      val r = GeoFunctions.haversineKmScalar(a2, o2, a1, o1)
      d >= 0 && math.abs(d - r) < 1e-6 &&
        d <= math.Pi * GeoFunctions.EarthRadiusKm + 1e-6
    })
  }

  test("haversine triangle inequality on the sphere") {
    check(Prop.forAll(lat, lon, lat, lon, lat, lon) { (a1, o1, a2, o2, a3, o3) =>
      val ab = GeoFunctions.haversineKmScalar(a1, o1, a2, o2)
      val bc = GeoFunctions.haversineKmScalar(a2, o2, a3, o3)
      val ac = GeoFunctions.haversineKmScalar(a1, o1, a3, o3)
      ac <= ab + bc + 1e-6
    })
  }
}
