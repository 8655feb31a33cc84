package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.CrsMath

class CrsSpec extends AnyFunSuite {

  test("UTM anchors: central meridian maps to E=500000, equator to N=0") {
    // zone 45 (EPSG:32645, the Everest fixtures' CRS): lon0 = 87°E
    val (e1, n1) = CrsMath.utmForward(87.0, 0.0, 45, south = false)
    assert(math.abs(e1 - 500000.0) < 1e-6)
    assert(math.abs(n1) < 1e-6)
    // scale factor at the central meridian is k0: 1° of latitude at the
    // equator ≈ 110574.39 m of northing scaled by 0.9996
    val (_, n2) = CrsMath.utmForward(87.0, 1.0, 45, south = false)
    assert(math.abs(n2 - 0.9996 * 110574.3885) < 1.0)
    // south zone false northing (EPSG:32718, zone 18S, lon0 = -75°)
    val (e3, n3) = CrsMath.utmForward(-75.0, 0.0, 18, south = true)
    assert(math.abs(e3 - 500000.0) < 1e-6 && math.abs(n3 - 10000000.0) < 1e-6)
  }

  test("UTM known point: Everest region (86.9250E, 27.9881N) in zone 45N") {
    // cross-checked against an independent Snyder-series implementation:
    // E=492625.00, N=3095886.41 (the two methods agree to <1 mm)
    val (e, n) = CrsMath.utmForward(86.9250, 27.9881, 45, south = false)
    assert(math.abs(e - 492625.00) < 0.01, s"easting $e")
    assert(math.abs(n - 3095886.41) < 0.01, s"northing $n")
  }

  test("UTM round-trip < 1e-6 m over the zone") {
    for (lon <- Seq(84.2, 87.0, 89.9); lat <- Seq(-60.0, -27.5, 0.0, 27.9881, 71.3)) {
      val (x, y) = CrsMath.utmForward(lon, lat, 45, south = lat < 0)
      val (lon2, lat2) = CrsMath.utmInverse(x, y, 45, south = lat < 0)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon,$lat")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lon,$lat")
    }
  }

  test("polar stereographic round-trip and pole anchor") {
    val (x0, y0) = CrsMath.polarStereoForward(0.0, -90.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
    for (lon <- Seq(-170.0, -45.0, 0.0, 90.0, 179.0); lat <- Seq(-89.0, -75.0, -71.0, -55.0)) {
      val (x, y) = CrsMath.polarStereoForward(lon, lat)
      val (lon2, lat2) = CrsMath.polarStereoInverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon,$lat")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lon,$lat")
    }
    // at the standard parallel -71°, ρ = a·m(71°) (scale true there);
    // cross-checked against Snyder: ρ(-71°) = 2082760.11 m
    val (x, y) = CrsMath.polarStereoForward(0.0, -71.0)
    assert(math.abs(math.hypot(x, y) - 2082760.11) < 0.01)
  }

  test("densified footprint reprojects a UTM bounds polygon to lon/lat") {
    val spark = SharedSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fp = Seq((450000.0, 3050000.0, 550000.0, 3150000.0))
      .toDF("minx", "miny", "maxx", "maxy")
      .select(graft.functions.GeoFunctions.st_footprint(
        col("minx"), col("miny"), col("maxx"), col("maxy"),
        lit(10), lit(32645), lit(4326)))
      .collect()(0).getString(0)
    val g = graft.functions.GeoFunctions.parse(fp)
    assert(g.getNumPoints == 41) // 4 edges × 10 + closing point
    val e = g.getEnvelopeInternal
    assert(e.getMinX > 86 && e.getMaxX < 88 && e.getMinY > 27 && e.getMaxY < 29)
    assert(g.isValid)
  }

  test("zone helpers") {
    assert(CrsMath.utmZoneOf(86.925) == 45)
    assert(CrsMath.utmZoneOf(-75.0) == 18)
    assert(CrsMath.utmEpsg(45, south = false) == 32645)
    assert(CrsMath.utmEpsg(18, south = true) == 32718)
    intercept[IllegalArgumentException] { CrsMath.transform(9999, 4326) }
  }

  test("transform factory composes with Reproject semantics (monotone per axis locally)") {
    val t = CrsMath.transform(4326, 32645)
    val (x1, _) = t(86.0, 28.0); val (x2, _) = t(87.0, 28.0)
    assert(x1 < x2)
    val inv = CrsMath.transform(32645, 4326)
    val (lon, lat) = inv(500000.0, 3095248.0)
    assert(math.abs(lon - 87.0) < 0.2 && lat > 27 && lat < 29)
  }
}
