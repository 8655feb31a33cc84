package graft

import org.apache.spark.sql.functions._
import graft.ops.{CtPatch, Gridding}

/** Round-5 specs: the C1 Clough–Tocher gridding element (reduced HCT
  * centroid split + Nielson minimum-norm-network gradients) — the scipy
  * interpolant class that SURVEY §7.4.8 previously documented as a C0
  * divergence. Pins, in order of strength: quadratic reproduction of the
  * element, C1 continuity across macro and micro edges on ARBITRARY
  * Hermite data, MNN stationarity at convergence, affine exactness of the
  * gradient solve, and the end-to-end pipeline (linear-field equality,
  * third-order convergence, partition invariance). */
class Ops13Spec extends SparkSpec {

  private def bary(ax: Double, ay: Double, bx: Double, by: Double,
                   cx: Double, cy: Double, x: Double, y: Double)
      : (Double, Double, Double) = {
    val det = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
    val l1 = ((by - cy) * (x - cx) + (cx - bx) * (y - cy)) / det
    val l2 = ((cy - ay) * (x - cx) + (ax - cx) * (y - cy)) / det
    (l1, l2, 1.0 - l1 - l2)
  }

  test("CtPatch reproduces quadratics exactly given exact gradients") {
    def q(x: Double, y: Double) = 0.5 * x * x - 0.3 * x * y + 0.8 * y * y + 2 * x - y + 3
    def gx(x: Double, y: Double) = x - 0.3 * y + 2
    def gy(x: Double, y: Double) = -0.3 * x + 1.6 * y - 1
    // two differently-shaped triangles, one obtuse
    val tris = Seq(
      ((0.0, 0.0), (4.0, 1.0), (1.0, 3.0)),
      ((-2.0, 1.0), (5.0, 0.5), (6.0, 2.0)))
    for (((ax, ay), (bx, by), (cx, cy)) <- tris) {
      val o = CtPatch.ordinates(
        ax, ay, q(ax, ay), gx(ax, ay), gy(ax, ay),
        bx, by, q(bx, by), gx(bx, by), gy(bx, by),
        cx, cy, q(cx, cy), gx(cx, cy), gy(cx, cy))
      var worst = 0.0
      var i = 0
      while (i <= 20) {
        var j = 0
        while (i + j <= 20) {
          val l1 = i / 20.0; val l2 = j / 20.0; val l3 = 1 - l1 - l2
          val x = l1 * ax + l2 * bx + l3 * cx
          val y = l1 * ay + l2 * by + l3 * cy
          worst = math.max(worst, math.abs(CtPatch.eval(o, l1, l2, l3) - q(x, y)))
          j += 1
        }
        i += 1
      }
      assert(worst < 1e-10, s"quadratic reproduction, worst=$worst")
    }
  }

  // C1 on ARBITRARY Hermite data (no underlying smooth field): the
  // normal derivative along the shared macro edge is linear on both
  // sides with shared endpoint values g_v·n̂, so the patches agree.
  // Second-order one-sided Richardson differences (h=1e-5, cubic ⇒
  // O(h²)=1e-10 truncation) straddle the edge from each triangle.
  test("CtPatch is C1 across a shared macro edge on arbitrary data") {
    val (ax, ay) = (0.0, 0.0); val (bx, by) = (4.0, 1.0)
    val (cx, cy) = (1.0, 3.0)  // left of edge A→B
    val (dx0, dy0) = (2.0, -2.0) // right of edge A→B
    val data = Map(
      (ax, ay) -> (1.3, 0.7, -0.4), (bx, by) -> (-0.8, 0.2, 1.1),
      (cx, cy) -> (2.1, -0.5, 0.3), (dx0, dy0) -> (0.6, 1.2, 0.9))
    def ord(p1: (Double, Double), p2: (Double, Double), p3: (Double, Double)) = {
      val (f1, g1x, g1y) = data(p1); val (f2, g2x, g2y) = data(p2)
      val (f3, g3x, g3y) = data(p3)
      CtPatch.ordinates(p1._1, p1._2, f1, g1x, g1y,
                        p2._1, p2._2, f2, g2x, g2y,
                        p3._1, p3._2, f3, g3x, g3y)
    }
    val oL = ord((ax, ay), (bx, by), (cx, cy))
    val oR = ord((bx, by), (ax, ay), (dx0, dy0)) // opposite winding on purpose
    def evalL(x: Double, y: Double) = {
      val (l1, l2, l3) = bary(ax, ay, bx, by, cx, cy, x, y)
      CtPatch.eval(oL, l1, l2, l3)
    }
    def evalR(x: Double, y: Double) = {
      val (l1, l2, l3) = bary(bx, by, ax, ay, dx0, dy0, x, y)
      CtPatch.eval(oR, l1, l2, l3)
    }
    val len = math.sqrt(17.0)
    val (nx, ny) = (-1.0 / len, 4.0 / len) // unit normal, points toward C
    val h = 1e-5
    for (t <- Seq(0.15, 0.3, 0.5, 0.7, 0.85)) {
      val px = ax + t * (bx - ax); val py = ay + t * (by - ay)
      val v1 = evalL(px, py); val v2 = evalR(px, py)
      assert(math.abs(v1 - v2) < 1e-12, s"C0 at t=$t: $v1 vs $v2")
      val dL = (4 * evalL(px + h * nx, py + h * ny) -
                evalL(px + 2 * h * nx, py + 2 * h * ny) - 3 * v1) / (2 * h)
      val dR = -(4 * evalR(px - h * nx, py - h * ny) -
                 evalR(px - 2 * h * nx, py - 2 * h * ny) - 3 * v2) / (2 * h)
      assert(math.abs(dL - dR) < 1e-6,
        s"normal-derivative jump at t=$t: $dL vs $dR")
    }
  }

  test("CtPatch is C1 across the interior micro edges of the split") {
    val (ax, ay) = (0.0, 0.0); val (bx, by) = (4.0, 0.5); val (cx, cy) = (1.5, 3.5)
    val o = CtPatch.ordinates(ax, ay, 1.3, 0.7, -0.4,
                              bx, by, -0.8, 0.2, 1.1,
                              cx, cy, 2.1, -0.5, 0.3)
    def f(x: Double, y: Double) = {
      val (l1, l2, l3) = bary(ax, ay, bx, by, cx, cy, x, y)
      CtPatch.eval(o, l1, l2, l3) // eval picks the mini-patch itself
    }
    val (dx0, dy0) = ((ax + bx + cx) / 3, (ay + by + cy) / 3)
    val h = 1e-5
    for ((vx, vy) <- Seq((ax, ay), (bx, by), (cx, cy));
         t <- Seq(0.25, 0.5, 0.75)) {
      // point on the micro edge vertex→centroid, strictly interior
      val px = vx + t * (dx0 - vx); val py = vy + t * (dy0 - vy)
      val ex = dx0 - vx; val ey = dy0 - vy
      val el = math.sqrt(ex * ex + ey * ey)
      val (nx, ny) = (-ey / el, ex / el)
      val v0 = f(px, py)
      val dPlus = (4 * f(px + h * nx, py + h * ny) -
                   f(px + 2 * h * nx, py + 2 * h * ny) - 3 * v0) / (2 * h)
      val dMinus = -(4 * f(px - h * nx, py - h * ny) -
                     f(px - 2 * h * nx, py - 2 * h * ny) - 3 * v0) / (2 * h)
      assert(math.abs(dPlus - dMinus) < 1e-6,
        s"micro-edge derivative jump at vertex ($vx,$vy) t=$t: $dPlus vs $dMinus")
    }
  }

  test("mnnGradients: exact on affine fields, stationary at convergence") {
    // irregular-ish star graph over a jittered 7×7 lattice
    val pts = (for (i <- 0 until 7; j <- 0 until 7) yield {
      val x = j * 2.0 + ((i * 31 + j * 17) % 21 - 10) / 32.0
      val y = i * 2.0 + ((i * 13 + j * 29) % 21 - 10) / 32.0
      (x, y, 0.5 * x + 0.25 * y + 3.0)
    }).toArray
    val nbrs = Array.fill(pts.length)(scala.collection.mutable.Set.empty[Int])
    for (i <- 0 until 7; j <- 0 until 7; (di, dj) <- Seq((0, 1), (1, 0), (1, 1)))
      if (i + di < 7 && j + dj < 7) {
        val a = i * 7 + j; val b = (i + di) * 7 + (j + dj)
        nbrs(a) += b; nbrs(b) += a
      }
    val gAff = Gridding.mnnGradients(pts, nbrs)
    gAff.foreach { case (gx, gy) =>
      assert(math.abs(gx - 0.5) < 1e-12 && math.abs(gy - 0.25) < 1e-12,
        s"affine gradients exact: ($gx,$gy)")
    }
    // curved field: verify the converged gradients satisfy the MNN
    // stationarity system Σ e(8 g_p·e + 4 g_q·e − 12Δ)/L³ = 0 per vertex
    val ptsC = pts.map { case (x, y, _) =>
      (x, y, math.sin(x / 3.0) * math.cos(y / 4.0)) }
    val g = Gridding.mnnGradients(ptsC, nbrs)
    for (v <- ptsC.indices) {
      var r1 = 0.0; var r2 = 0.0
      nbrs(v).foreach { n =>
        val dx = ptsC(n)._1 - ptsC(v)._1; val dy = ptsC(n)._2 - ptsC(v)._2
        val dz = ptsC(n)._3 - ptsC(v)._3
        val l3 = math.pow(dx * dx + dy * dy, 1.5)
        val s = 8 * (g(v)._1 * dx + g(v)._2 * dy) +
                4 * (g(n)._1 * dx + g(n)._2 * dy) - 12 * dz
        r1 += s * dx / l3; r2 += s * dy / l3
      }
      assert(math.abs(r1) < 1e-7 && math.abs(r2) < 1e-7,
        s"MNN residual at vertex $v: ($r1,$r2)")
    }
  }

  test("cubic_ct gridding agrees with linear on a linear field") {
    import spark.implicits._
    val sites = (for (i <- 0 to 20; j <- 0 to 20) yield {
      val x = j * 5.0 + (if (i % 3 == 1 && j % 4 == 2) 1.25 else 0.0)
      val y = i * 5.0
      (x, y, 2.0 * x - 0.5 * y + 7.0)
    }).toDF("x", "y", "value")
    def run(m: String) = graft.ops.RasterOps.cells(Gridding.delaunayGrid(
      sites, 0.5, 0.5, 0, 100, 200, 200, 50, 50,
      method = m, distNodataPixel = 12.0, haloPixels = 25))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val lin = run("linear"); val ct = run("cubic_ct")
    assert(lin.keySet == ct.keySet)
    lin.foreach { case (k, v) =>
      assert(math.abs(ct(k) - v) < 1e-9, s"cell $k: linear $v vs ct ${ct(k)}") }
  }

  test("cubic_ct gridding: third-order convergence on a smooth field") {
    import spark.implicits._
    def truth(x: Double, y: Double): Double = math.sin(x / 8.0) * math.cos(y / 10.0)
    def maxInteriorErr(spacing: Double): Double = {
      val n = (100.0 / spacing).toInt
      val sites = (for (i <- 0 to n; j <- 0 to n) yield {
        val x = j * spacing; val y = i * spacing
        (x, y, truth(x, y))
      }).toDF("x", "y", "value")
      val cells = graft.ops.RasterOps.cells(Gridding.delaunayGrid(
        sites, 0.5, 0.5, 0, 100, 200, 200, 50, 50,
        method = "cubic_ct", distNodataPixel = 2 * spacing + 1))
        .collect()
      var worst = 0.0
      cells.foreach { r =>
        val i = r.getInt(0); val j = r.getInt(1)
        val cx = 0.25 + j * 0.5; val cy = 100 - 0.25 - i * 0.5
        if (cx >= 8 && cx <= 92 && cy >= 8 && cy <= 92) {
          val e = math.abs(r.getDouble(2) - truth(cx, cy))
          if (e > worst) worst = e
        }
      }
      worst
    }
    val e4 = maxInteriorErr(4.0)
    val e2 = maxInteriorErr(2.0)
    assert(e4 < 0.02, s"h=4 interior error sane: $e4")
    assert(e2 * 5.0 < e4,
      s"halving h must shrink the error ≥5× (third-order ⇒ ≈8×): $e4 → $e2")
  }

  // the distributed block-Jacobi rounds and the single-machine
  // Gauss–Seidel converge the SAME convex energy — on a one-tile point
  // set (identical edge set) the unique minimizer must agree
  test("globalMnnGradients matches the local MNN solve on a one-tile set") {
    import spark.implicits._
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    import org.locationtech.jts.triangulate.DelaunayTriangulationBuilder
    val pts = (for (i <- 0 until 7; j <- 0 until 7) yield {
      val x = 2.0 + j * 2.0 + ((i * 31 + j * 17) % 21 - 10) / 32.0
      val y = 2.0 + i * 2.0 + ((i * 13 + j * 29) % 21 - 10) / 32.0
      (x, y, math.sin(x / 3.0) * math.cos(y / 4.0))
    }).sorted.toArray
    // local reference: triangulate the same set, converge Gauss–Seidel
    val b = new DelaunayTriangulationBuilder()
    val coords = new java.util.ArrayList[Coordinate](pts.length)
    pts.foreach { case (x, y, v) => coords.add(new Coordinate(x, y, v)) }
    b.setSites(coords)
    val tris = b.getTriangles(new GeometryFactory())
    val idxOf = pts.zipWithIndex.map { case (p, i) => ((p._1, p._2), i) }.toMap
    val nbrs = Array.fill(pts.length)(scala.collection.mutable.Set.empty[Int])
    for (t <- 0 until tris.getNumGeometries) {
      val cs = tris.getGeometryN(t).getCoordinates
      val v = cs.take(3).map(c => idxOf((c.x, c.y)))
      nbrs(v(0)) += v(1); nbrs(v(0)) += v(2)
      nbrs(v(1)) += v(0); nbrs(v(1)) += v(2)
      nbrs(v(2)) += v(0); nbrs(v(2)) += v(1)
    }
    val local = Gridding.mnnGradients(pts, nbrs)
    // distributed: one 40×40 tile covers every point (no halo seams)
    val dist = Gridding.globalMnnGradients(
      pts.toSeq.toDF("x", "y", "value"), 1.0, 1.0, 0, 40, 40, 40, 40, 40)
      .select("x", "y", "gx", "gy").collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap
    pts.zipWithIndex.foreach { case ((x, y, _), i) =>
      val (gx, gy) = dist((x, y))
      assert(math.abs(gx - local(i)._1) < 1e-6 && math.abs(gy - local(i)._2) < 1e-6,
        s"vertex $i: dist ($gx,$gy) vs local ${local(i)}")
    }
  }

  test("cubic_ct with globally-solved gradients reproduces an affine field") {
    import spark.implicits._
    val sites = (for (i <- 0 to 20; j <- 0 to 20) yield {
      val x = j * 5.0 + (if (i > 0 && i < 20 && j > 0 && j < 20)
                           ((i * 31 + j * 17) % 21 - 10) / 8.0 else 0.0)
      val y = i * 5.0 + (if (i > 0 && i < 20 && j > 0 && j < 20)
                           ((i * 13 + j * 29) % 21 - 10) / 8.0 else 0.0)
      (x, y, 0.5 * x + 0.25 * y + 3.0)
    }).toDF("x", "y", "value")
    val withG = Gridding.globalMnnGradients(
      sites, 0.5, 0.5, 0, 100, 200, 200, 50, 50)
    val cells = graft.ops.RasterOps.cells(Gridding.delaunayGrid(
      withG, 0.5, 0.5, 0, 100, 200, 200, 50, 50,
      method = "cubic_ct", distNodataPixel = 12.0,
      gradientCols = Some(("gx", "gy"))))
      .collect()
    assert(cells.length > 30000, s"coverage sane: ${cells.length}")
    cells.foreach { r =>
      val cx = 0.25 + r.getInt(1) * 0.5; val cy = 100 - 0.25 - r.getInt(0) * 0.5
      val want = 0.5 * cx + 0.25 * cy + 3.0
      assert(math.abs(r.getDouble(2) - want) < 1e-8,
        s"cell (${r.getInt(0)},${r.getInt(1)}): ${r.getDouble(2)} vs $want")
    }
  }

  test("cubic_ct gridding is partition-invariant (1 vs 16)") {
    import spark.implicits._
    val sites = (for (i <- 0 to 24; j <- 0 to 24) yield {
      val x = j * 4.0 + ((i * 31 + j * 17) % 21 - 10) / 8.0
      val y = i * 4.0 + ((i * 13 + j * 29) % 21 - 10) / 8.0
      (x, y, math.sin(x / 7.0) + 0.3 * y)
    }).toDF("x", "y", "value")
    def run(parts: Int) = graft.ops.RasterOps.cells(Gridding.delaunayGrid(
      sites.repartition(parts), 0.5, 0.5, 0, 100, 200, 200, 50, 50,
      method = "cubic_ct", distNodataPixel = 10.0))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(run(1) == run(16))
  }
}
