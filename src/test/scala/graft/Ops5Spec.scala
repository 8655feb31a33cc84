package graft

import org.apache.spark.sql.functions._
import graft.io.GeoTables
import graft.ops._

class Ops5Spec extends SparkSpec {

  test("point gridding matches brute force incl. value tiebreak") {
    val pts = GeoTables.points(spark, sf001).select(col("x"), col("y"), col("value"))
    val got = PointGrid.grid(pts, 0.25, 0.25, 0, 100, 40, 40, cutoff = 2.0)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    val local = pts.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    for (i <- 0 until 40; j <- 0 until 40) {
      val cx = 0.125 + j * 0.25; val cy = 100 - 0.125 - i * 0.25
      val ds = local.map { case (x, y, v) =>
        ((x - cx) * (x - cx) + (y - cy) * (y - cy), v) }
      val dmin = ds.map(_._1).min
      if (dmin <= 4.0) {
        val vmin = ds.filter(_._1 == dmin).map(_._2).min
        assert(got((i, j)) == ((dmin, vmin)), s"($i,$j)")
      } else assert(!got.contains((i, j)), s"($i,$j)")
    }
  }

  test("nearestValue tiebreak: equidistant points resolve to min value") {
    import spark.implicits._
    val pts = Seq((1.0, 0.0, 9.0), (-1.0, 0.0, 3.0), (0.0, 1.0, 7.0))
      .toDF("x", "y", "value")
    val q = Seq((1L, 0.0, 0.0)).toDF("qid", "qx", "qy")
    val r = Knn.nearestValue(q, pts, GeoTables.KnnLevel).collect()(0)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 3.0)
  }

  test("sjoin intersects equals the bbox oracle predicate on boxes") {
    val z = GeoTables.zones(spark, sf001)
    val got = rowSet(SpatialJoin.sjoin(
      z.select(col("zone_id").as("id_a"), col("wkt").as("wkt_a")),
      z.select(col("zone_id").as("id_b"), col("wkt").as("wkt_b")),
      "intersects", 5).where(col("id_a") < col("id_b")))
    val zs = z.collect().map(r => (r.getAs[Long]("zone_id"),
      r.getAs[Double]("zxmin"), r.getAs[Double]("zymin"),
      r.getAs[Double]("zxmax"), r.getAs[Double]("zymax")))
    val exp = (for {
      (ia, ax0, ay0, ax1, ay1) <- zs; (ib, bx0, by0, bx1, by1) <- zs
      if ia < ib && ax0 <= bx1 && bx0 <= ax1 && ay0 <= by1 && by0 <= ay1
    } yield Seq[Any](ia, ib)).toSet
    assert(got == exp)
  }

  test("merge mean matches the two-generator golden") {
    import graft.io.RasterGen
    val out = RasterOps.cells(TileOps.merge(
      Seq(RasterGen.tiles(spark), RasterGen.tiles2(spark)), "mean"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    var checked = 0
    for (i <- 0 until 400 by 7; j <- 0 until 400 by 11) {
      val v1 = if (RasterGen.valid(i, j)) Some(RasterGen.value(i, j)) else None
      val v2 = if (RasterGen.valid2(i, j)) Some(RasterGen.value2(i, j)) else None
      (v1, v2) match {
        case (Some(a), Some(b)) => assert(out((i, j)) == (a + b) / 2); checked += 1
        case (Some(a), None) => assert(out((i, j)) == a); checked += 1
        case (None, Some(b)) => assert(out((i, j)) == b); checked += 1
        case (None, None) => assert(!out.contains((i, j)))
      }
    }
    assert(checked > 1000)
  }
}
