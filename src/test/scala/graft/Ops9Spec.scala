package graft

import org.apache.spark.sql.functions._
import graft.geo.SatImg
import graft.io.RasterGen
import graft.ops.{Gridding, RasterOps, StatsBundle, TileOps}

/** Specs for round-2 wave-2 operators: satimg parsing, Delaunay gridding,
  * ufunc catalog, gradient, assignment under mask. */
class Ops9Spec extends SparkSpec {

  test("satimg filename parsing matches the reference goldens (test_satimg.py:95-140)") {
    val cases = Seq(
      ("TDM1_DEM__30_N00E104_DEM.tif",
        ("TanDEM-X", "TanDEM-X", "TDM1", "N00E104", null)),
      ("SETSM_WV02_20141026_ex1030010037D17F00_10300100380B4000_mosaic5_2m_v3.0_dem.tif",
        ("WorldView", "WV02", "ArcticDEM/REMA/EarthDEM", null, "2014-10-26 00:00:00")),
      ("SETSM_s2s041_WV02_20150615_10300100443C2D00_1030010043373000_seg1_2m_dem.tif",
        ("WorldView", "WV02", "ArcticDEM/REMA/EarthDEM", null, "2015-06-15 00:00:00")),
      ("AST_L1A_00303132015224418_final.tif",
        ("Terra", "ASTER", "L1A", null, "2015-03-13 22:44:18")),
      ("ILAKS1B_20190928_271_Gilkey-DEM.tif",
        ("IceBridge", "UAF-LS", "ILAKS1B", null, "2019-09-28 00:00:00")),
      ("srtm_06_01.tif",
        ("SRTM", "SRTM", "SRTMv4.1", "06_01", "2000-02-15 00:00:00")),
      ("ASTGTM2_N00E108_dem.tif",
        ("Terra", "ASTER", "ASTGTM2", "N00E108", null)),
      ("N00E015.hgt",
        ("SRTM", "SRTM", "SRTMGL1", "N00E015", "2000-02-15 00:00:00")),
      ("NASADEM_HGT_n00e041.hgt",
        ("SRTM", "SRTM", "NASADEM-HGT", "n00e041", "2000-02-15 00:00:00")))
    cases.foreach { case (name, (platform, sensor, product, tile, dt)) =>
      val m = SatImg.parseMetadata(name)
      assert(m.platform == platform, s"$name platform ${m.platform}")
      assert(m.sensor == sensor, s"$name sensor ${m.sensor}")
      assert(m.product == product, s"$name product ${m.product}")
      assert(m.tile_name == tile, s"$name tile ${m.tile_name}")
      assert(m.datetime == dt, s"$name dt ${m.datetime}")
    }
    // Landsat + Sentinel-2 forms
    val l1 = SatImg.parseMetadata("LC81400412017123LGN00_B1.tif")
    assert(l1.platform == "Landsat 8" && l1.sensor == "OLI/TIRS" && l1.tile_name == "140041")
    assert(l1.datetime == "2017-05-03 00:00:00") // doy 123 of 2017
    val l2 = SatImg.parseMetadata("LC08_L1TP_140041_20170503_20170503_01_T1.tif")
    assert(l2.platform == "Landsat 8" && l2.tile_name == "140041" &&
      l2.datetime == "2017-05-03 00:00:00")
    val s2 = SatImg.parseMetadata("T31TGK_20210101T103021.tif")
    assert(s2.platform == "Sentinel-2" && s2.sensor == "MSI" &&
      s2.tile_name == "31TGK" && s2.datetime == "2021-01-01 10:30:21")
    assert(SatImg.parseMetadata("random_name.tif").platform == null)
  }

  test("sw tile naming round-trips (test_satimg.py:145-190)") {
    assert(SatImg.swNamingToLatLon("N14W065") == (14.0, -65.0))
    assert(SatImg.swNamingToLatLon("S14E065") == (-14.0, 65.0))
    assert(SatImg.swNamingToLatLon("W065N14") == (14.0, -65.0))
    assert(SatImg.latLonToSwNaming(0, 0) == "N00E000")
    assert(SatImg.latLonToSwNaming(-90, 0) == "S90E000")
    assert(SatImg.latLonToSwNaming(0, -180) == "N00W180")
    assert(SatImg.latLonToSwNaming(0, 180) == "N00W180")
    // TDX widths by latitude band
    assert(SatImg.parseTileAttr("N82E104", "TDM1")._4 == 4)
    assert(SatImg.parseTileAttr("N62E104", "TDM1")._4 == 2)
    assert(SatImg.parseTileAttr("N00E104", "TDM1")._4 == 1)
    assert(SatImg.parseTileAttr("N00E104", "SRTMGL1") == (0.0, 104.0, 1, 1, 4326))
  }

  test("delaunay gridding reproduces a linear field exactly and cuts far cells") {
    import spark.implicits._
    // irregular (non-grid-aligned) points of a linear field on [0,20]²,
    // dense enough that every cell has a point within 1 px
    val pts = (for (i <- 0 until 21; j <- 0 until 21) yield {
      val x = math.min(19.9, j + 0.13 * ((i * 7 + j * 3) % 5))
      val y = math.min(19.9, i + 0.11 * ((i * 3 + j * 11) % 7))
      (x, y, 2.0 * x + 7.0 * y + 1.0)
    }).toDF("x", "y", "value")
    val out = RasterOps.cells(Gridding.delaunayGrid(pts, 1, 1, 0, 20, 20, 20, 5, 5,
        haloPixels = 25))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out.nonEmpty)
    out.foreach { case ((i, j), v) =>
      val cx = j + 0.5; val cy = 20 - i - 0.5
      assert(math.abs(v - (2 * cx + 7 * cy + 1)) < 1e-9, s"($i,$j)")
    }
    // far-cell cutoff: a single point grids exactly one surviving cell set
    val one = Seq((10.2, 10.2, 5.0)).toDF("x", "y", "value")
    val got = RasterOps.cells(Gridding.delaunayGrid(one, 1, 1, 0, 20, 20, 20, 5, 5,
        method = "nearest"))
      .collect()
    assert(got.nonEmpty && got.length < 15, s"cutoff failed: ${got.length} cells")
  }

  test("delaunay gridding is partition-invariant") {
    import spark.implicits._
    val pts = (for (k <- 0 until 300) yield {
      val x = (k * 37 % 200) / 10.0; val y = (k * 53 % 200) / 10.0
      (x, y, (k % 13).toDouble)
    }).distinct.toDF("x", "y", "value")
    def run(p: Int, m: String) = rowSet(RasterOps.cells(
      Gridding.delaunayGrid(pts.repartition(p), 1, 1, 0, 20, 20, 20, 5, 5,
        method = m, haloPixels = 25)))
    assert(run(1, "linear") == run(16, "linear"))
    assert(run(1, "cubic") == run(16, "cubic"))
  }

  test("StatsBundle approx_percentile gate stays close to the exact bundle") {
    import org.apache.spark.sql.functions.col
    val p = io.GeoTables.points(spark, sf001).select(col("value"))
    val e = StatsBundle.bundle(p, "value", exact = true).collect()(0)
    val a = StatsBundle.bundle(p, "value", exact = false).collect()(0)
    assert(e.getAs[Long]("n") == a.getAs[Long]("n"))
    assert(e.getAs[Double]("sum_val") == a.getAs[Double]("sum_val"))
    // accuracy-10000 ⇒ rank error ≤ 0.01% ⇒ tiny neighborhood of the
    // exact order statistic; generous tolerance for value-space gaps
    for (f <- Seq("median_val", "p05", "p95", "le90", "iqr", "nmad")) {
      val ev = e.getAs[Double](f); val av = a.getAs[Double](f)
      assert(math.abs(ev - av) <= math.abs(ev) * 0.02 + 0.5, s"$f: $ev vs $av")
    }
  }

  test("cubic gridding agrees with linear on a linear field") {
    import spark.implicits._
    val pts = (for (i <- 0 until 21; j <- 0 until 21) yield {
      val x = math.min(19.9, j + 0.13 * ((i * 7 + j * 3) % 5))
      val y = math.min(19.9, i + 0.11 * ((i * 3 + j * 11) % 7))
      (x, y, 2.0 * x + 7.0 * y + 1.0)
    }).toDF("x", "y", "value")
    val out = RasterOps.cells(Gridding.delaunayGrid(pts, 1, 1, 0, 20, 20, 20, 5, 5,
        method = "cubic", haloPixels = 25))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out.nonEmpty)
    // LS gradients are exact on linear fields, so the cubic Bézier patch
    // collapses to the linear interpolant: same cells, same values
    out.foreach { case ((i, j), v) =>
      val cx = j + 0.5; val cy = 20 - i - 0.5
      assert(math.abs(v - (2 * cx + 7 * cy + 1)) < 1e-9, s"($i,$j)")
    }
  }

  test("cubic gridding matches the hand-computed Bézier golden on a curved field") {
    import spark.implicits._
    // single triangle {(0,0,0),(2,0,4),(0,2,4)} sampled from f = x²+y².
    // Hand derivation: the 2-neighbor LS gradients are (2,2) at every
    // vertex; edge controls b210=b201=4/3, b120=b102=8/3, b021=b012=4,
    // b111 = (Σedge)/4 − (Σvertex)/6 = 8/3. At the cell center (0.5,0.5)
    // the barycentrics are (1/2,1/4,1/4) and the patch evaluates to
    // exactly 2.0 (8/27·27/... worked through by hand = 0.125+1.375+0.5).
    val pts = Seq((0.0, 0.0, 0.0), (2.0, 0.0, 4.0), (0.0, 2.0, 4.0))
      .toDF("x", "y", "value")
    val out = RasterOps.cells(Gridding.delaunayGrid(pts, 1, 1, 0, 3, 3, 3, 3, 3,
        method = "cubic", haloPixels = 4))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out.contains((2, 0)), s"cell (2,0) missing: $out")
    assert(math.abs(out((2, 0)) - 2.0) < 1e-12, s"golden: ${out((2, 0))}")
  }

  test("reducePointsWith median/min/max match local goldens") {
    import spark.implicits._
    val pts = Seq((1L, 5.1, 5.1), (2L, 0.1, 19.9), (3L, 12.4, 7.7)).toDF("pid", "x", "y")
    def v(i: Int, j: Int) = ((i * 7 + j * 13) % 97).toDouble
    def ok(i: Int, j: Int) = (i * 31 + j * 17) % 101 != 0
    for (red <- Seq("median", "min", "max", "mean")) {
      val out = RasterOps.reducePointsWith(pts, RasterGen.tiles(spark), 1,
          0.25, 0.25, 0, 100, 400, 400, 50, 50, red)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      Seq((1L, 5.1, 5.1), (2L, 0.1, 19.9), (3L, 12.4, 7.7)).foreach { case (pid, x, y) =>
        val ci = ((100 - y) / 0.25).toInt; val cj = (x / 0.25).toInt
        val vs = (for {
          di <- -1 to 1; dj <- -1 to 1
          si = ci + di; sj = cj + dj
          if si >= 0 && si < 400 && sj >= 0 && sj < 400 && ok(si, sj)
        } yield v(si, sj)).sorted
        val exp = red match {
          case "min" => vs.min
          case "max" => vs.max
          case "mean" => vs.sum / vs.length
          case "median" =>
            if (vs.length % 2 == 1) vs(vs.length / 2)
            else (vs(vs.length / 2 - 1) + vs(vs.length / 2)) / 2.0
        }
        assert(math.abs(out(pid) - exp) < 1e-9, s"$red pid $pid")
      }
    }
  }

  test("gradient matches local central/one-sided differences") {
    val out = RasterOps.cells(TileOps.gradient(RasterGen.tiles(spark),
        RasterGen.TilesX, RasterGen.TilesY).filter(_.band == 1))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    def v(i: Int, j: Int) = ((i * 7 + j * 13) % 97).toDouble
    def ok(i: Int, j: Int) = (i * 31 + j * 17) % 101 != 0
    for (i <- 100 until 110; j <- 0 until 400) {
      val jl = math.max(0, j - 1); val jr = math.min(399, j + 1)
      if (ok(i, jl) && ok(i, jr) && jr > jl) {
        val exp = (v(i, jr) - v(i, jl)) / ((jr - jl) * 0.25)
        assert(out((i, j)) == exp, s"($i,$j)")
      } else assert(!out.contains((i, j)), s"($i,$j)")
    }
  }

  test("ufunc catalog applies only to valid cells") {
    val sq = RasterOps.cells(TileOps.ufunc(RasterGen.tiles(spark), "square"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    def v(i: Int, j: Int) = ((i * 7 + j * 13) % 97).toDouble
    def ok(i: Int, j: Int) = (i * 31 + j * 17) % 101 != 0
    for (i <- 0 until 20; j <- 0 until 400)
      if (ok(i, j)) assert(sq((i, j)) == v(i, j) * v(i, j))
      else assert(!sq.contains((i, j)))
  }
}
