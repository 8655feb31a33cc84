package graft

import org.apache.spark.sql.Dataset
import graft.geo.CellIndex
import graft.model.{RasterTile, TileCodec}
import graft.ops.Polygonize
import graft.io.RasterGen

class PolygonizeSpec extends SparkSpec {

  /** Build a tiled raster dataset from a dense array (nodata = NaN). */
  def tilesOf(arr: Array[Array[Double]], tileH: Int, tileW: Int): Dataset[RasterTile] = {
    val h = arr.length; val w = arr(0).length
    require(h % tileH == 0 && w % tileW == 0)
    val ts = for {
      tr <- 0 until h / tileH; tc <- 0 until w / tileW
    } yield {
      val data = new Array[Double](tileH * tileW)
      val valid = new Array[Boolean](tileH * tileW)
      for (i <- 0 until tileH; j <- 0 until tileW) {
        val v = arr(tr * tileH + i)(tc * tileW + j)
        valid(i * tileW + j) = !v.isNaN
        data(i * tileW + j) = if (v.isNaN) -9999 else v
      }
      RasterTile("t", 0, tr, tc, tileW, tileH, 1.0, 1.0,
        tc * tileW, h - tr * tileH, // xmin, ymax: y grows up, row 0 on top
        "EPSG:32645", -9999, "Area", "float64",
        TileCodec.packDoubles(data), TileCodec.packMask(valid),
        CellIndex.cellOf(tc * tileW, tr * tileH, 3))
    }
    import spark.implicits._
    spark.createDataset(ts)
  }

  val N = Double.NaN

  test("conn4x4 golden: 1 component at conn=8, 2 at conn=4 (test_vectorization.py:366-383)") {
    // 4x4 zeros with ones at (1,1) and (2,2); tile boundary at 2
    val a = Array(
      Array(0.0, 0, 0, 0),
      Array(0.0, 1, 0, 0),
      Array(0.0, 0, 1, 0),
      Array(0.0, 0, 0, 0))
    val t = tilesOf(a, 2, 2)
    def comps(conn: Int, value: Double): Long =
      Polygonize.polygonize(t, conn, tileW = 2, tileH = 2, tilesX = 2, tilesY = 2).where(s"raster_value = $value").count()
    assert(comps(4, 1.0) == 2, "conn=4 → diagonal ones separate")
    assert(comps(8, 1.0) == 1, "conn=8 → diagonal ones connect")
    // the zero background wraps around and stays one component either way
    assert(comps(4, 0.0) == 1)
    assert(comps(8, 0.0) == 1)
  }

  test("components crossing tile seams merge (label_union semantics)") {
    // a 4-wide horizontal bar crossing the vertical tile boundary
    val a = Array(
      Array(N, N, N, N),
      Array(1.0, 1, 1, 1),
      Array(N, N, N, N),
      Array(N, N, 2.0, N))
    val out = Polygonize.polygonize(tilesOf(a, 2, 2), 4, tileW = 2, tileH = 2, tilesX = 2, tilesY = 2).collect()
    assert(out.length == 2)
    val bar = out.find(_.getAs[Double]("raster_value") == 1.0).get
    assert(bar.getAs[Long]("n_cells") == 4)
    // geometry is the full 4×1 rectangle spanning both tiles
    val g = graft.functions.GeoFunctions.parse(bar.getAs[String]("wkt"))
    assert(g.getArea == 4.0)
    assert(g.getEnvelopeInternal.getMinX == 0 && g.getEnvelopeInternal.getMaxX == 4)
  }

  test("value-area identity: sum(area) == count(value)*xres*yres (test_vectorization.py:287-298)") {
    val out = Polygonize.polygonize(RasterGen.tiles(spark), 4)
      .selectExpr("raster_value", "n_cells", "wkt").collect()
    // per-component area equals cell count × cell area (0.25²)
    out.foreach { r =>
      val area = graft.functions.GeoFunctions.parse(r.getAs[String]("wkt")).getArea
      assert(math.abs(area - r.getAs[Long]("n_cells") * 0.0625) < 1e-9,
        s"value ${r.getAs[Double]("raster_value")}")
    }
    // totals: all valid cells accounted for
    val totalCells = out.map(_.getAs[Long]("n_cells")).sum
    var expect = 0L
    for (i <- 0 until RasterGen.H; j <- 0 until RasterGen.W if RasterGen.valid(i, j)) expect += 1
    assert(totalCells == expect)
  }

  test("partition-invariance: identical normalized ring sets at 1 vs 16 partitions") {
    def run(parts: Int): Set[(Double, Long, String)] =
      Polygonize.polygonize(RasterGen.tiles(spark).repartition(parts), 4)
        .collect()
        .map(r => (r.getAs[Double]("raster_value"), r.getAs[Long]("n_cells"),
                   r.getAs[String]("wkt"))).toSet
    val a = run(1); val b = run(16)
    assert(a.map(x => (x._1, x._2)) == b.map(x => (x._1, x._2)))
    assert(a == b, "normalized WKT must match exactly")
  }

  test("literal ring-set goldens (normalized WKT) on conn4x4") {
    val a = Array(
      Array(0.0, 0, 0, 0),
      Array(0.0, 1, 0, 0),
      Array(0.0, 0, 1, 0),
      Array(0.0, 0, 0, 0))
    val got = Polygonize.polygonize(tilesOf(a, 2, 2), 4, tileW = 2, tileH = 2, tilesX = 2, tilesY = 2)
      .where("raster_value = 1.0").collect()
      .map(_.getAs[String]("wkt")).toSet
    // grid: res 1, ymax=4 — cell (1,1) spans x[1,2]×y[2,3]; (2,2) spans
    // x[2,3]×y[1,2]; JTS-normalized exterior rings:
    assert(got == Set(
      "POLYGON ((1 2, 1 3, 2 3, 2 2, 1 2))",
      "POLYGON ((2 1, 2 2, 3 2, 3 1, 2 1))"), got)
    // conn=8 union of the diagonal pair is the normalized multipolygon
    val got8 = Polygonize.polygonize(tilesOf(a, 2, 2), 8, tileW = 2, tileH = 2, tilesX = 2, tilesY = 2)
      .where("raster_value = 1.0").collect().map(_.getAs[String]("wkt")).toSet
    assert(got8 == Set(
      "MULTIPOLYGON (((1 2, 1 3, 2 3, 2 2, 1 2)), ((2 1, 2 2, 3 2, 3 1, 2 1)))"), got8)
  }

  /** 40×40 deterministic raster with few values and holes — components
    * cross many seams; tiles 10×10 (16 tiles). */
  def seamy(): Array[Array[Double]] =
    Array.tabulate(40, 40) { (i, j) =>
      if ((i * 5 + j * 11) % 31 == 0) N
      else ((i / 3 + j / 4) % 3).toDouble
    }

  test("all three strategies × conn 4/8 produce identical ring sets (test_vectorization.py:409-497)") {
    val t = tilesOf(seamy(), 10, 10)
    for (conn <- Seq(4, 8)) {
      def run(strategy: String): Set[(Double, Long, String)] =
        Polygonize.polygonize(t, conn, strategy = strategy,
            tileW = 10, tileH = 10, tilesX = 4, tilesY = 4)
          .collect()
          .map(r => (r.getAs[Double]("raster_value"), r.getAs[Long]("n_cells"),
                     r.getAs[String]("wkt"))).toSet
      val union = run("label_union")
      val lstitch = run("label_stitch")
      val gstitch = run("geometry_stitch")
      assert(union == lstitch, s"label_stitch differs at conn=$conn")
      assert(union == gstitch, s"geometry_stitch differs at conn=$conn")
    }
  }

  test("distributed union-find (ufThreshold=0) equals the driver path on a 256-tile grid") {
    // 80×80 grid, tiles 5×5 → 256 tiles; every seam pair forced through
    // the iterative hash-min propagation
    val arr = Array.tabulate(80, 80) { (i, j) =>
      if ((i * 7 + j * 13) % 41 == 0) N else ((i / 5 + j / 7) % 4).toDouble
    }
    val t = tilesOf(arr, 5, 5)
    def run(thr: Long): Set[(Double, Long, String)] =
      Polygonize.polygonize(t, 4, ufThreshold = thr,
          tileW = 5, tileH = 5, tilesX = 16, tilesY = 16)
        .collect()
        .map(r => (r.getAs[Double]("raster_value"), r.getAs[Long]("n_cells"),
                   r.getAs[String]("wkt"))).toSet
    assert(run(Long.MaxValue) == run(0L))
  }

  test("conn=8 joins across diagonal tile corners") {
    // ones at the corner of four tiles: (1,1),(1,2),(2,1),(2,2) all = 1
    // but only diagonals (1,1),(2,2) set — tiles 2x2 → corner at (2,2)
    val a = Array(
      Array(0.0, 0, 0, 0),
      Array(0.0, 1, 0, 0),
      Array(0.0, 0, 1, 0),
      Array(0.0, 0, 0, 0))
    // same as conn4x4 but the diagonal pair sits EXACTLY across the tile
    // corner (tile boundary at 2): labels live in different tiles and only
    // the diagonal seam can join them.
    val out = Polygonize.polygonize(tilesOf(a, 2, 2), 8, tileW = 2, tileH = 2, tilesX = 2, tilesY = 2)
      .where("raster_value = 1.0").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_cells") == 2)
  }
}
