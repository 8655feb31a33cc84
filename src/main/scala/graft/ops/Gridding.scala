package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.triangulate.DelaunayTriangulationBuilder

import graft.model.{RasterTile, TileCodec}

/** Irregular pointcloud → raster gridding via Delaunay triangulation — the
  * reference's `griddata`-based `_grid_pointcloud`
  * (`interface/gridding.py:33-102`):
  *
  *  1. triangulate the point cloud, linearly interpolate each grid-cell
  *     center inside its triangle (barycentric weights);
  *  2. cells farther than `distNodataPixel` PIXELS from every point are
  *     nodata (griddata fills the whole convex hull otherwise);
  *  3. cells outside the convex hull are nodata.
  *
  * Distributed shape: points replicate to every tile whose
  * `haloPixels`-expanded bounds contain them (pure column math, the same
  * pattern as Rasterize's feature→tile routing); each tile triangulates
  * its local point set. The local triangulation equals the global one
  * wherever the containing triangle's support lies within the halo — with
  * the default cutoff of 1 pixel, surviving cells have a point within one
  * pixel, so a halo ≥ a few tens of pixels reproduces the reference on
  * all but pathologically sparse-but-surviving cells (partition-invariant
  * regardless: tiles always see the same deterministic local set).
  *
  * method: "linear" (the reference default) | "nearest" | "cubic". The
  * reference's "cubic" maps to scipy's C1 Clough–Tocher spline
  * (`gridding.py:33-102` → `griddata(method="cubic")`); the distributed
  * counterpart here is a per-triangle interpolating cubic Bézier patch:
  * vertex gradients estimated by inverse-distance-squared weighted least
  * squares over the vertex's Delaunay neighbors (globally-solved Nielson
  * gradients don't distribute; LS gradients are exact on linear fields so
  * cubic == linear there), edge controls b_210 = f_i + ∇f_i·(P_j−P_i)/3,
  * and the quadratic-precision interior control
  * b_111 = (Σ edge controls)/4 − (Σ vertex values)/6. The patch
  * interpolates all vertices and is C0 across edges (the shared-edge
  * curve depends only on shared endpoint data); C1 would need the
  * Clough–Tocher 3-way split's cross-edge conditions, which this
  * deliberately trades for a halo-local, partition-invariant kernel.
  */
object Gridding {

  /** Per-vertex gradient by weighted least squares over Delaunay
    * neighbors: minimize Σ w (z_n − z_v − gx·dx − gy·dy)², w = 1/d².
    * Exact for linear fields; degenerate stars fall back to (0,0). */
  private[ops] def lsGradients(pts: Array[(Double, Double, Double)],
                               nbrs: Array[scala.collection.mutable.Set[Int]])
      : Array[(Double, Double)] = {
    val g = new Array[(Double, Double)](pts.length)
    var v = 0
    while (v < pts.length) {
      var a11 = 0.0; var a12 = 0.0; var a22 = 0.0; var r1 = 0.0; var r2 = 0.0
      nbrs(v).foreach { n =>
        val dx = pts(n)._1 - pts(v)._1; val dy = pts(n)._2 - pts(v)._2
        val dz = pts(n)._3 - pts(v)._3
        val w = 1.0 / (dx * dx + dy * dy)
        a11 += w * dx * dx; a12 += w * dx * dy; a22 += w * dy * dy
        r1 += w * dx * dz; r2 += w * dy * dz
      }
      val det = a11 * a22 - a12 * a12
      g(v) = if (math.abs(det) < 1e-12 * math.max(a11, a22) * math.max(a11, a22) ||
                 det == 0.0) (0.0, 0.0)
             else ((a22 * r1 - a12 * r2) / det, (a11 * r2 - a12 * r1) / det)
      v += 1
    }
    g
  }

  def delaunayGrid(points: DataFrame, xres: Double, yres: Double,
                   xmin: Double, ymax: Double, width: Int, height: Int,
                   tileW: Int, tileH: Int,
                   method: String = "linear", distNodataPixel: Double = 1.0,
                   haloPixels: Int = 32,
                   crs: String = "EPSG:32645", nodata: Double = -99999.0)
      : org.apache.spark.sql.Dataset[RasterTile] = {
    require(method == "linear" || method == "nearest" || method == "cubic",
      s"method $method unsupported")
    require(haloPixels >= distNodataPixel,
      "halo must cover the nodata cutoff distance (surviving cells must see their nearest point)")
    val spark = points.sparkSession
    import spark.implicits._
    val tilesX = (width + tileW - 1) / tileW
    val tilesY = (height + tileH - 1) / tileH

    // fractional pixel coords; route each point to all tiles whose
    // halo-expanded pixel range contains it
    val fi = (lit(ymax) - col("y")) / yres
    val fj = (col("x") - lit(xmin)) / xres
    // clamped tile ranges; the lo<=hi guard drops points farther than the
    // halo from the whole grid (sequence(9,7) would otherwise DESCEND and
    // route them to phantom out-of-grid tiles)
    val routed = points
      .withColumn("fi", fi).withColumn("fj", fj)
      .withColumn("trlo", greatest(floor((col("fi") - haloPixels) / tileH).cast("int"), lit(0)))
      .withColumn("trhi", least(floor((col("fi") + haloPixels) / tileH).cast("int"), lit(tilesY - 1)))
      .withColumn("tclo", greatest(floor((col("fj") - haloPixels) / tileW).cast("int"), lit(0)))
      .withColumn("tchi", least(floor((col("fj") + haloPixels) / tileW).cast("int"), lit(tilesX - 1)))
      .where(col("trlo") <= col("trhi") && col("tclo") <= col("tchi"))
      .withColumn("tile_row", explode(sequence(col("trlo"), col("trhi"))))
      .withColumn("tile_col", explode(sequence(col("tclo"), col("tchi"))))
      .select(col("tile_row"), col("tile_col"), col("x"), col("y"), col("value"))
      .as[(Int, Int, Double, Double, Double)]

    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    routed.groupByKey(r => (r._1, r._2)).mapGroups {
      (key: (Int, Int), it: Iterator[(Int, Int, Double, Double, Double)]) =>
        val (tr, tc) = key
        val tw = math.min(tileW, width - tc * tileW)
        val th = math.min(tileH, height - tr * tileH)
        val x0 = xmin + tc.toLong * tileW * xres
        val y1 = ymax - tr.toLong * tileH * yres
        // deterministic local point set: sort, dedup (x,y) keeping min value
        val pts = it.map(r => (r._3, r._4, r._5)).toArray.sorted
          .foldLeft(Vector.empty[(Double, Double, Double)]) { (acc, p) =>
            if (acc.nonEmpty && acc.last._1 == p._1 && acc.last._2 == p._2) acc
            else acc :+ p
          }.toArray

        val data = Array.fill(tw * th)(nodata)
        val valid = new Array[Boolean](tw * th)

        @inline def cellIdx(cx: Double, cy: Double): (Int, Int) =
          (((y1 - cy) / yres - 0.5).round.toInt, ((cx - x0) / xres - 0.5).round.toInt)

        if (pts.length >= (if (method == "nearest") 1 else 3)) {
          if (method == "linear" || method == "cubic") {
            val gf = new GeometryFactory()
            val b = new DelaunayTriangulationBuilder()
            val coords = new java.util.ArrayList[Coordinate](pts.length)
            pts.foreach { case (x, y, v) => coords.add(new Coordinate(x, y, v)) }
            b.setSites(coords)
            val tris = b.getTriangles(gf)

            // cubic needs vertex identity (gradients live on vertices):
            // map triangle corners back to the sorted point array
            // boxed Integer values: a missing key returns null (which we
            // require against) instead of silently unboxing to vertex 0
            val idxOf: java.util.HashMap[(Double, Double), Integer] =
              if (method == "cubic") {
                val m = new java.util.HashMap[(Double, Double), Integer](pts.length * 2)
                var v = 0
                while (v < pts.length) { m.put((pts(v)._1, pts(v)._2), Integer.valueOf(v)); v += 1 }
                m
              } else null
            @inline def vertexIdx(x: Double, y: Double): Int = {
              val v = idxOf.get((x, y))
              require(v != null, s"triangulation vertex ($x,$y) is not a site (snapped by JTS?)")
              v.intValue
            }
            val grads: Array[(Double, Double)] =
              if (method == "cubic") {
                val nbrs = Array.fill(pts.length)(scala.collection.mutable.Set.empty[Int])
                var t = 0
                while (t < tris.getNumGeometries) {
                  val cs = tris.getGeometryN(t).getCoordinates
                  val v0 = vertexIdx(cs(0).x, cs(0).y)
                  val v1 = vertexIdx(cs(1).x, cs(1).y)
                  val v2 = vertexIdx(cs(2).x, cs(2).y)
                  nbrs(v0) += v1; nbrs(v0) += v2
                  nbrs(v1) += v0; nbrs(v1) += v2
                  nbrs(v2) += v0; nbrs(v2) += v1
                  t += 1
                }
                lsGradients(pts, nbrs)
              } else null

            var t = 0
            while (t < tris.getNumGeometries) {
              val g = tris.getGeometryN(t)
              val cs = g.getCoordinates // ring: 4 coords
              val (ax, ay, az) = (cs(0).x, cs(0).y, cs(0).getZ)
              val (bx, by, bz) = (cs(1).x, cs(1).y, cs(1).getZ)
              val (ccx, ccy, cz) = (cs(2).x, cs(2).y, cs(2).getZ)
              val det = (by - ay) * (ccx - ax) - (bx - ax) * (ccy - ay)
              if (det != 0.0) {
                // cubic Bézier control net from vertex values + gradients
                var b210 = 0.0; var b201 = 0.0; var b120 = 0.0
                var b021 = 0.0; var b102 = 0.0; var b012 = 0.0; var b111 = 0.0
                if (method == "cubic") {
                  val (g1x, g1y) = grads(vertexIdx(ax, ay))
                  val (g2x, g2y) = grads(vertexIdx(bx, by))
                  val (g3x, g3y) = grads(vertexIdx(ccx, ccy))
                  b210 = az + (g1x * (bx - ax) + g1y * (by - ay)) / 3
                  b201 = az + (g1x * (ccx - ax) + g1y * (ccy - ay)) / 3
                  b120 = bz + (g2x * (ax - bx) + g2y * (ay - by)) / 3
                  b021 = bz + (g2x * (ccx - bx) + g2y * (ccy - by)) / 3
                  b102 = cz + (g3x * (ax - ccx) + g3y * (ay - ccy)) / 3
                  b012 = cz + (g3x * (bx - ccx) + g3y * (by - ccy)) / 3
                  b111 = (b210 + b201 + b120 + b021 + b102 + b012) / 4 -
                         (az + bz + cz) / 6
                }
                // cell centers within the triangle bbox ∩ tile
                val minx = math.min(ax, math.min(bx, ccx)); val maxx = math.max(ax, math.max(bx, ccx))
                val miny = math.min(ay, math.min(by, ccy)); val maxy = math.max(ay, math.max(by, ccy))
                val j0 = math.max(0, math.floor((minx - x0) / xres - 0.5).toInt)
                val j1m = math.min(tw - 1, math.ceil((maxx - x0) / xres).toInt)
                val i0 = math.max(0, math.floor((y1 - maxy) / yres - 0.5).toInt)
                val i1m = math.min(th - 1, math.ceil((y1 - miny) / yres).toInt)
                var i = i0
                while (i <= i1m) {
                  val cy = y1 - (i + 0.5) * yres
                  var j = j0
                  while (j <= j1m) {
                    val cx = x0 + (j + 0.5) * xres
                    // barycentric coordinates
                    val l1 = ((by - ccy) * (cx - ccx) + (ccx - bx) * (cy - ccy)) /
                             ((by - ccy) * (ax - ccx) + (ccx - bx) * (ay - ccy))
                    val l2 = ((ccy - ay) * (cx - ccx) + (ax - ccx) * (cy - ccy)) /
                             ((by - ccy) * (ax - ccx) + (ccx - bx) * (ay - ccy))
                    val l3 = 1.0 - l1 - l2
                    if (l1 >= 0 && l2 >= 0 && l3 >= 0) {
                      data(i * tw + j) =
                        if (method == "cubic")
                          az * l1 * l1 * l1 + bz * l2 * l2 * l2 + cz * l3 * l3 * l3 +
                          3 * (b210 * l1 * l1 * l2 + b201 * l1 * l1 * l3 +
                               b120 * l1 * l2 * l2 + b021 * l2 * l2 * l3 +
                               b102 * l1 * l3 * l3 + b012 * l2 * l3 * l3) +
                          6 * b111 * l1 * l2 * l3
                        else l1 * az + l2 * bz + l3 * cz
                      valid(i * tw + j) = true
                    }
                    j += 1
                  }
                  i += 1
                }
              }
              t += 1
            }
          }

          // distance cutoff (and the nearest-method value): mark cells
          // within ceil(distNodataPixel)+1 of each point with min distance
          val r = math.ceil(distNodataPixel).toInt + 1
          val minD2 = Array.fill(tw * th)(Double.MaxValue)
          val nearV = new Array[Double](tw * th)
          pts.foreach { case (px, py, pv) =>
            val pfi = (y1 - py) / yres - 0.5; val pfj = (px - x0) / xres - 0.5
            val ci = math.round(pfi).toInt; val cj = math.round(pfj).toInt
            var i = math.max(0, ci - r)
            while (i <= math.min(th - 1, ci + r)) {
              var j = math.max(0, cj - r)
              while (j <= math.min(tw - 1, cj + r)) {
                val d2 = (pfi - i) * (pfi - i) + (pfj - j) * (pfj - j)
                val k = i * tw + j
                if (d2 < minD2(k)) { minD2(k) = d2; nearV(k) = pv }
                j += 1
              }
              i += 1
            }
          }
          val cut2 = distNodataPixel * distNodataPixel
          var k = 0
          while (k < tw * th) {
            if (method == "nearest") {
              valid(k) = minD2(k) <= cut2
              data(k) = if (valid(k)) nearV(k) else nodata
            } else if (valid(k) && minD2(k) > cut2) {
              valid(k) = false; data(k) = nodata
            }
            k += 1
          }
        }

        RasterTile("grid", 0, tr, tc, tw, th, xres, yres, x0, y1,
          crs, nodata, "Area", "float64",
          TileCodec.packDoubles(data), TileCodec.packMask(valid),
          graft.geo.CellIndex.cellOf(x0 + 1e-9, y1 - th * yres + 1e-9, 3))
    }(Encoders.product[RasterTile]).union {
      // point-free tiles still belong to the output grid (all-nodata)
      val have = routed.toDF().select(col("tile_row"), col("tile_col"))
        .distinct().as[(Int, Int)]
      spark.range(tilesY.toLong * tilesX)
        .map(id => ((id / tilesX).toInt, (id % tilesX).toInt))
        .except(have)
        .map { case (tr, tc) =>
          val tw = math.min(tileW, width - tc * tileW)
          val th = math.min(tileH, height - tr * tileH)
          val x0 = xmin + tc.toLong * tileW * xres
          val y1 = ymax - tr.toLong * tileH * yres
          RasterTile("grid", 0, tr, tc, tw, th, xres, yres, x0, y1,
            crs, nodata, "Area", "float64",
            TileCodec.packDoubles(Array.fill(tw * th)(nodata)),
            TileCodec.packMask(new Array[Boolean](tw * th)),
            graft.geo.CellIndex.cellOf(x0 + 1e-9, y1 - th * yres + 1e-9, 3))
        }
    }
  }
}
