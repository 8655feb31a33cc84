package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import graft.geo.{CellIndex, SplitMix64}
import graft.model.{RasterTile, TileCodec}
import graft.ops._

/** Specs for wave-2 operators: focal filters, rasterize, interp_points,
  * proximity, lineage, splitmix sampling. */
class Ops2Spec extends SparkSpec {

  /** 20×20 deterministic raster, tiles 5×5, res 1.0, origin (0,20),
    * value = (i*3 + j*7) % 23, invalid where (i*5 + j*11) % 29 == 0. */
  def smallTiles(): Dataset[RasterTile] = {
    import spark.implicits._
    spark.createDataset(for { tr <- 0 until 4; tc <- 0 until 4 } yield {
      val data = new Array[Double](25); val valid = new Array[Boolean](25)
      for (di <- 0 until 5; dj <- 0 until 5) {
        val i = tr * 5 + di; val j = tc * 5 + dj
        val ok = (i * 5 + j * 11) % 29 != 0
        valid(di * 5 + dj) = ok
        data(di * 5 + dj) = if (ok) ((i * 3 + j * 7) % 23).toDouble else -9999
      }
      RasterTile("s", 0, tr, tc, 5, 5, 1.0, 1.0, tc * 5, 20 - tr * 5,
        "EPSG:32645", -9999, "Area", "float64",
        TileCodec.packDoubles(data), TileCodec.packMask(valid),
        CellIndex.cellOf(tc * 5, 20 - tr * 5 - 5, 3))
    })
  }
  def sv(i: Int, j: Int): Double = ((i * 3 + j * 7) % 23).toDouble
  def sok(i: Int, j: Int): Boolean = (i * 5 + j * 11) % 29 != 0

  test("focal filters match local golden (mean/min/max/median, cross-tile halo)") {
    for (kernel <- Seq("mean", "min", "max", "median")) {
      val out = RasterOps.cells(Filters.focal(smallTiles(), kernel, 1, 4, 4, 5, 5))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      for (i <- 0 until 20; j <- 0 until 20) {
        if (sok(i, j)) {
          val vs = (for {
            di <- -1 to 1; dj <- -1 to 1
            ii = i + di; jj = j + dj
            if ii >= 0 && ii < 20 && jj >= 0 && jj < 20 && sok(ii, jj)
          } yield sv(ii, jj)).sorted
          val exp = kernel match {
            case "mean" => vs.sum / vs.length
            case "min"  => vs.min
            case "max"  => vs.max
            case "median" =>
              if (vs.length % 2 == 1) vs(vs.length / 2)
              else (vs(vs.length / 2 - 1) + vs(vs.length / 2)) / 2.0
          }
          assert(math.abs(out((i, j)) - exp) < 1e-9, s"$kernel ($i,$j)")
        } else assert(!out.contains((i, j)), s"$kernel ($i,$j) invalid stays invalid")
      }
    }
  }

  test("focal filter is partition-invariant") {
    def run(p: Int) = rowSet(RasterOps.cells(
      Filters.focal(smallTiles().repartition(p), "mean", 1, 4, 4, 5, 5)))
    assert(run(1) == run(16))
  }

  test("rasterize burns zones with highest-burn-wins; createMask counts coverage") {
    val zones = io.GeoTables.zones(spark, sf001)
    val burned = Rasterize.rasterize(zones.select(col("wkt"), col("zone_id").cast("double").as("b")),
      Some("b"), 0.25, 0.25, 0, 100, 400, 400, 50, 50)
    val got = RasterOps.cells(burned).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

    val zs = zones.collect().map(r => (r.getAs[Long]("zone_id").toDouble,
      r.getAs[Double]("zxmin"), r.getAs[Double]("zymin"),
      r.getAs[Double]("zxmax"), r.getAs[Double]("zymax")))
    var covered = 0L
    for (i <- 0 until 400; j <- 0 until 400) {
      val cx = 0.125 + j * 0.25; val cy = 100 - 0.125 - i * 0.25
      val hits = zs.filter { case (_, x0, y0, x1, y1) => cx > x0 && cx < x1 && cy > y0 && cy < y1 }
      if (hits.nonEmpty) {
        covered += 1
        assert(got((i, j)) == hits.map(_._1).max, s"($i,$j)")
      } else assert(!got.contains((i, j)))
    }
    val mask = Rasterize.createMask(zones.select(col("wkt")), 0.25, 0.25, 0, 100, 400, 400, 50, 50)
    val m = RasterOps.stats(mask).collect()(0)
    assert(m.getAs[Long]("n_valid") == covered)
    assert(m.getAs[Long]("n_total") == 160000L)
  }

  test("rasterize orderCol gives GDAL last-feature-wins for non-monotone burns") {
    import spark.implicits._
    // two overlapping rects, feature order 1→2 but burns 5→2: GDAL paints
    // in feature order so the overlap gets the LATER feature's burn (2),
    // while the default max-burn contract would give 5
    val feats = Seq(
      ("POLYGON ((2 2, 12 2, 12 12, 2 12, 2 2))", 5.0, 1L),
      ("POLYGON ((8 8, 18 8, 18 18, 8 18, 8 8))", 2.0, 2L))
      .toDF("wkt", "b", "fidx")
    def burnAt(out: Map[(Int, Int), Double], x: Double, y: Double): Option[Double] =
      out.get(((20 - y - 0.5).toInt, (x - 0.5).toInt))
    val ordered = RasterOps.cells(Rasterize.rasterize(feats, Some("b"),
        1, 1, 0, 20, 20, 20, 5, 5, orderCol = Some("fidx")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(burnAt(ordered, 10.5, 10.5).contains(2.0), "overlap: last feature wins")
    assert(burnAt(ordered, 3.5, 3.5).contains(5.0), "only-A region keeps burn 5")
    assert(burnAt(ordered, 16.5, 16.5).contains(2.0), "only-B region keeps burn 2")
    val maxWins = RasterOps.cells(Rasterize.rasterize(feats, Some("b"),
        1, 1, 0, 20, 20, 20, 5, 5))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(burnAt(maxWins, 10.5, 10.5).contains(5.0), "default: max burn wins")
  }

  test("interp_points bilinear is exact on a linear field and spreads nodata") {
    import spark.implicits._
    // linear field over smallTiles grid shape but all-valid
    val linTiles = spark.createDataset(for { tr <- 0 until 4; tc <- 0 until 4 } yield {
      val data = new Array[Double](25)
      for (di <- 0 until 5; dj <- 0 until 5) {
        val x = tc * 5 + dj + 0.5; val y = 20 - (tr * 5 + di) - 0.5
        data(di * 5 + dj) = 2 * x + 7 * y
      }
      RasterTile("lin", 0, tr, tc, 5, 5, 1.0, 1.0, tc * 5, 20 - tr * 5,
        "EPSG:32645", -9999, "Area", "float64",
        TileCodec.packDoubles(data), TileCodec.packMask(Array.fill(25)(true)),
        CellIndex.cellOf(tc * 5, 20 - tr * 5 - 5, 3))
    })
    val pts = Seq((1L, 3.3, 4.7), (2L, 10.0, 10.0), (3L, 17.21, 2.11), (4L, 0.6, 19.4))
      .toDF("pid", "x", "y")
    val out = PointInterp.interp(pts, linTiles, 1, 1, 0, 20, 20, 20, 5, 5, "bilinear")
      .collect().map(r => r.getLong(0) -> r.getAs[java.lang.Double]("value")).toMap
    Seq((1L, 3.3, 4.7), (2L, 10.0, 10.0), (3L, 17.21, 2.11), (4L, 0.6, 19.4)).foreach {
      case (id, x, y) => assert(math.abs(out(id) - (2 * x + 7 * y)) < 1e-9, s"pid $id")
    }
    // nodata spreading on the masked raster: a point whose 4-neighborhood
    // includes an invalid cell yields null
    val inv = (for (i <- 0 until 20; j <- 0 until 20 if !sok(i, j)) yield (i, j)).head
    val px = inv._2 + 0.5; val py = 20 - inv._1 - 0.5 // dead-center on invalid cell
    val out2 = PointInterp.interp(Seq((9L, px, py)).toDF("pid", "x", "y"),
      smallTiles(), 1, 1, 0, 20, 20, 20, 5, 5, "bilinear").collect()
    assert(out2.length == 1 && out2(0).isNullAt(1))
  }

  test("interp_points quintic reproduces a degree-5 field and spreads nodata 3 px") {
    import spark.implicits._
    def f(x: Double, y: Double): Double = {
      val u = x / 10; val v = y / 10
      100 * u * u * v * v * v + 3 * u - 2 * v + 5
    }
    val q5Tiles = spark.createDataset(for { tr <- 0 until 4; tc <- 0 until 4 } yield {
      val data = new Array[Double](25)
      for (di <- 0 until 5; dj <- 0 until 5) {
        val x = tc * 5 + dj + 0.5; val y = 20 - (tr * 5 + di) - 0.5
        data(di * 5 + dj) = f(x, y)
      }
      RasterTile("q5", 0, tr, tc, 5, 5, 1.0, 1.0, tc * 5, 20 - tr * 5,
        "EPSG:32645", -9999, "Area", "float64",
        TileCodec.packDoubles(data), TileCodec.packMask(Array.fill(25)(true)),
        CellIndex.cellOf(tc * 5, 20 - tr * 5 - 5, 3))
    })
    // interior points: the 6×6 support must stay in-grid
    val pts = Seq((1L, 5.3, 6.7), (2L, 10.0, 10.0), (3L, 13.21, 8.11), (4L, 7.6, 12.4))
    val out = PointInterp.interp(pts.toDF("pid", "x", "y"), q5Tiles,
      1, 1, 0, 20, 20, 20, 5, 5, "quintic")
      .collect().map(r => r.getLong(0) -> r.getAs[java.lang.Double]("value")).toMap
    pts.foreach { case (id, x, y) =>
      assert(math.abs(out(id) - f(x, y)) < 1e-7, s"pid $id: ${out(id)} vs ${f(x, y)}")
    }
    // nodata spread: kill one interior cell; a point 3 px away (support
    // touches it) is null, a point 4 px away keeps its value
    val masked = q5Tiles.map { t =>
      if (t.tile_row == 2 && t.tile_col == 2) { // global cell (i=10..14, j=10..14)
        val valid = Array.fill(25)(true); valid(0) = false // global (10,10)
        t.copy(mask = TileCodec.packMask(valid))
      } else t
    }(q5Tiles.encoder)
    // invalid cell center: x=10.5, y=9.5. Point at same center + 2.5 in x
    // → fi/fj fractions put (10,10) inside the 6×6 support (offset −2..3)
    val probe = Seq((7L, 13.4, 9.5), (8L, 14.6, 9.5)).toDF("pid", "x", "y")
    val out2 = PointInterp.interp(probe, masked, 1, 1, 0, 20, 20, 20, 5, 5, "quintic")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("value"))).toMap
    assert(out2(7L).isEmpty, "support touches the invalid cell → null")
    assert(out2(8L).isDefined, "support clear of the invalid cell → value")
  }

  test("interp_points nearest equals cell value") {
    import spark.implicits._
    val pts = (for (i <- 0 until 20; j <- 0 until 20 if sok(i, j))
      yield (i.toLong * 100 + j, j + 0.3, 20 - i - 0.7)).toDF("pid", "x", "y")
    val out = PointInterp.interp(pts, smallTiles(), 1, 1, 0, 20, 20, 20, 5, 5, "nearest")
      .collect().map(r => r.getLong(0) -> r.getAs[java.lang.Double]("value")).toMap
    for (i <- 0 until 20; j <- 0 until 20 if sok(i, j))
      assert(out(i.toLong * 100 + j) == sv(i, j), s"($i,$j)")
  }

  test("proximity matches local brute force (exact kNN distances)") {
    val target = 5.0
    val out = Proximity.proximity(smallTiles(), target, 1, 1, 0, 20)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val targets = for (i <- 0 until 20; j <- 0 until 20 if sok(i, j) && sv(i, j) == target)
      yield (j + 0.5, 20 - i - 0.5)
    assert(targets.nonEmpty)
    for (i <- 0 until 20; j <- 0 until 20 if sok(i, j)) {
      val cx = j + 0.5; val cy = 20 - i - 0.5
      val exp = targets.map { case (tx, ty) =>
        math.sqrt((tx - cx) * (tx - cx) + (ty - cy) * (ty - cy)) }.min
      assert(math.abs(out((i, j)) - exp) < 1e-9, s"($i,$j)")
    }
  }

  test("lineage: second run is a no-op, resume processes only missing partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lineage").toString
    val df = spark.range(1000).select(col("id"),
      (col("id") % 8).as("bucket"), (col("id") * 31).as("cell"))
    val (n1, t1) = Lineage.runWithCheckpoint(spark, df, "bucket", dir)
    assert(n1 == 8 && t1 == 8)
    val (n2, t2) = Lineage.runWithCheckpoint(spark, df, "bucket", dir)
    assert(n2 == 0 && t2 == 8, "restart must anti-join committed partitions")
    val rows = spark.read.parquet(s"$dir/data").count()
    assert(rows == 1000)
  }

  test("splitmix topk is partition-invariant and matches local keys") {
    import spark.implicits._
    val ids = (1L to 10000L).toDF("gid")
    def run(p: Int) = Sampling.topk(ids.repartition(p), "gid", 50, seed = 42L)
      .collect().map(_.getLong(0)).toSeq
    val a = run(1); val b = run(16)
    assert(a == b)
    // reference compares keys as uint64: flip the sign bit for the local sort
    val local = (1L to 10000L).map(i => (SplitMix64.hash(i, 42L) ^ Long.MinValue, i))
      .sorted.take(50).map(_._2)
    assert(a == local)
  }
}
