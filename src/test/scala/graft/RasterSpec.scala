package graft

import org.apache.spark.sql.functions._
import graft.io.{GeoTables, RasterGen}
import graft.model.TileCodec
import graft.ops.RasterOps

class RasterSpec extends SparkSpec {

  /** Local (single-machine) golden computation from the pure cell fns. */
  private def localStats(): (Long, Double, Double, Double) = {
    var cnt = 0L; var sum = 0.0; var mn = Double.MaxValue; var mx = Double.MinValue
    for (i <- 0 until RasterGen.H; j <- 0 until RasterGen.W if RasterGen.valid(i, j)) {
      val v = RasterGen.value(i, j)
      cnt += 1; sum += v; if (v < mn) mn = v; if (v > mx) mx = v
    }
    (cnt, sum, mn, mx)
  }

  test("raster stats match local golden") {
    val (cnt, sum, mn, mx) = localStats()
    val r = RasterOps.stats(RasterGen.tiles(spark)).collect()(0)
    assert(r.getAs[Long]("n_valid") == cnt)
    assert(r.getAs[Long]("n_total") == RasterGen.H.toLong * RasterGen.W)
    assert(math.abs(r.getAs[Double]("sum_val") - sum) < 1e-6)
    assert(r.getAs[Double]("min_val") == mn && r.getAs[Double]("max_val") == mx)
  }

  test("crop matches local golden and prunes tiles") {
    val (wxmin, wymin, wxmax, wymax) = (10.0, 20.0, 35.0, 60.0)
    val got = rowSet(RasterOps.cropCells(RasterGen.tiles(spark), wxmin, wymin, wxmax, wymax))
    val expected = (for {
      i <- 0 until RasterGen.H; j <- 0 until RasterGen.W
      cx = 0.125 + j * 0.25; cy = 100 - 0.125 - i * 0.25
      if cx > wxmin && cx < wxmax && cy > wymin && cy < wymax && RasterGen.valid(i, j)
    } yield Seq[Any](i, j, RasterGen.value(i, j))).toSet
    assert(got == expected)
  }

  test("tileZip: dem + dem doubles the sum, masks AND") {
    val t = RasterGen.tiles(spark)
    val both = RasterOps.tileZip(t, t)(_ + _)
    val r = RasterOps.stats(both).collect()(0)
    val (cnt, sum, _, _) = localStats()
    assert(r.getAs[Long]("n_valid") == cnt)
    assert(math.abs(r.getAs[Double]("sum_val") - 2 * sum) < 1e-6)
  }

  test("tileMap applies only to valid cells") {
    val t = RasterGen.tiles(spark)
    val neg = RasterOps.tileMap(t)(v => -v)
    val r = RasterOps.stats(neg).collect()(0)
    val (cnt, sum, mn, mx) = localStats()
    assert(r.getAs[Long]("n_valid") == cnt)
    assert(math.abs(r.getAs[Double]("sum_val") + sum) < 1e-6)
    assert(r.getAs[Double]("min_val") == -mx && r.getAs[Double]("max_val") == -mn)
  }

  test("zonalBox matches per-zone local golden") {
    val zones = GeoTables.zones(spark, sf001)
    val got = RasterOps.zonalBox(RasterGen.tiles(spark), zones,
      100.0, 12.5, 12.5, RasterGen.TilesX, RasterGen.TilesY)
      .collect().map(r => r.getAs[Long]("zone_id") ->
        (r.getAs[Long]("n_cells"), r.getAs[Double]("sum_val"))).toMap

    val zloc = zones.collect().map(r => (r.getAs[Long]("zone_id"),
      r.getAs[Double]("zxmin"), r.getAs[Double]("zymin"),
      r.getAs[Double]("zxmax"), r.getAs[Double]("zymax")))
    zloc.foreach { case (id, zxmin, zymin, zxmax, zymax) =>
      var cnt = 0L; var sum = 0.0
      for (i <- 0 until RasterGen.H; j <- 0 until RasterGen.W if RasterGen.valid(i, j)) {
        val cx = 0.125 + j * 0.25; val cy = 100 - 0.125 - i * 0.25
        if (cx > zxmin && cx < zxmax && cy > zymin && cy < zymax) {
          cnt += 1; sum += RasterGen.value(i, j)
        }
      }
      if (cnt > 0) {
        val (gc, gs) = got(id)
        assert(gc == cnt, s"zone $id count")
        assert(math.abs(gs - sum) < 1e-9, s"zone $id sum")
      } else assert(!got.contains(id), s"zone $id should be absent")
    }
  }

  test("value histogram is partition-invariant and complete") {
    val h1 = rowSet(RasterOps.valueHistogram(RasterGen.tiles(spark).repartition(1)))
    val h16 = rowSet(RasterOps.valueHistogram(RasterGen.tiles(spark).repartition(16)))
    assert(h1 == h16)
    val total = h1.toSeq.map(_(1).asInstanceOf[Long]).sum
    assert(total == localStats()._1)
  }

  test("tile payload round-trip") {
    val t = RasterGen.makeTile(2, 3)
    val d = TileCodec.unpackDoubles(t.data)
    assert(d.length == 2500)
    val i = 17; val j = 29
    val gi = 2 * 50 + i; val gj = 3 * 50 + j
    assert(TileCodec.maskBit(t.mask, i * 50 + j) == RasterGen.valid(gi, gj))
    if (RasterGen.valid(gi, gj)) assert(d(i * 50 + j) == RasterGen.value(gi, gj))
    assert(t.xmin == 3 * 50 * 0.25 && t.ymax == 100 - 2 * 50 * 0.25)
  }
}
