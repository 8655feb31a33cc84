package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Geometry, GeometryFactory, Coordinate}
import org.locationtech.jts.io.{WKTReader, WKTWriter}
import org.locationtech.jts.operation.union.CascadedPolygonUnion

import graft.model.{RasterTile, TileCodec}

/** Polygonize — raster → vector tracing of connected equal-value regions
  * (the reference's largest op, `interface/vectorization.py`; strategy
  * "label_union", `vectorization.py:824-1101`).
  *
  * Distributed shape (SURVEY.md §3.2):
  *   1. per-tile connected-component labeling (mapPartitions kernel;
  *      float values canonicalized to the atol grid first, the
  *      chunk-stable grouping trick of `vectorization.py:66-107`)
  *   2. seam phase: 1-px border strips of adjacent tiles join on position;
  *      equal canonical values across the seam emit union pairs — seam
  *      data ≪ tile data, so pairs collect to a driver union-find exactly
  *      as the reference gathers seam pairs (`vectorization.py:1100-1101`)
  *   3. per-tile partial polygons (row-run rectangles unioned per label)
  *   4. dissolve: groupBy(global component) + cascaded-union aggregate
  *
  * Output: (component_id, raster_value, n_cells, wkt) — one row per
  * connected component; geometry may be a MultiPolygon under conn=8
  * (corner-touching cells).
  */
object Polygonize {

  /** Typed geometry-union aggregate (the `dissolve` primitive,
    * `vector/vector.py:892-916`): buffers WKT partials, unions once at
    * finish via CascadedPolygonUnion. */
  class UnionAgg extends Aggregator[String, List[String], String] {
    def zero: List[String] = Nil
    def reduce(b: List[String], a: String): List[String] = a :: b
    def merge(a: List[String], b: List[String]): List[String] = a ::: b
    def finish(parts: List[String]): String = {
      val gf = new GeometryFactory()
      val r = new WKTReader(gf)
      val geoms = new java.util.ArrayList[Geometry]()
      parts.foreach(w => geoms.add(r.read(w)))
      val u = if (geoms.size == 1) geoms.get(0) else CascadedPolygonUnion.union(geoms)
      u.normalize()
      new WKTWriter().write(u)
    }
    def bufferEncoder: Encoder[List[String]] = Encoders.kryo[List[String]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  val st_union_agg = udaf(new UnionAgg)

  // ---- per-tile kernels -----------------------------------------------

  /** Quantize to the atol grid (deterministic distributed grouping). */
  @inline private def canon(v: Double, atol: Double): Long =
    math.round(v / atol)

  /** Two-pass local labeling. Returns label image (-1 = invalid) with
    * labels 0..k-1 local to the tile. */
  private[ops] def labelTile(q: Array[Long], valid: Array[Boolean],
                             w: Int, h: Int, conn: Int): (Array[Int], Int) = {
    val lab = Array.fill(w * h)(-1)
    val parent = mutable.ArrayBuffer.empty[Int]
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    def union(a: Int, b: Int): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        val k = i * w + j
        if (valid(k)) {
          var l = -1
          // west
          if (j > 0 && valid(k - 1) && q(k - 1) == q(k)) l = find(lab(k - 1))
          // north
          if (i > 0 && valid(k - w) && q(k - w) == q(k)) {
            val ln = find(lab(k - w))
            if (l == -1) l = ln else union(l, ln)
          }
          if (conn == 8 && i > 0) {
            if (j > 0 && valid(k - w - 1) && q(k - w - 1) == q(k)) {
              val ld = find(lab(k - w - 1))
              if (l == -1) l = ld else union(l, ld)
            }
            if (j < w - 1 && valid(k - w + 1) && q(k - w + 1) == q(k)) {
              val ld = find(lab(k - w + 1))
              if (l == -1) l = ld else union(l, ld)
            }
          }
          if (l == -1) { l = parent.length; parent += l }
          lab(k) = l
        }
        j += 1
      }
      i += 1
    }
    // compact to root ids
    val rootMap = mutable.HashMap.empty[Int, Int]
    var next = 0
    var k = 0
    while (k < lab.length) {
      if (lab(k) >= 0) {
        val r = find(lab(k))
        lab(k) = rootMap.getOrElseUpdate(r, { val id = next; next += 1; id })
      }
      k += 1
    }
    (lab, next)
  }

  /** Global label id: tile linear index in the high bits. */
  @inline private def gid(tileIdx: Long, local: Int): Long = (tileIdx << 24) | local

  final case class Partial(label: Long, q: Long, nCells: Long, wkt: String)

  /** Row-run rectangles of one tile's label image, unioned per label. */
  private[ops] def tilePolygons(t: RasterTile, lab: Array[Int], nLab: Int,
                                q: Array[Long]): Seq[Partial] = {
    val gf = new GeometryFactory()
    val runs = Array.fill(nLab)(mutable.ArrayBuffer.empty[Geometry])
    val counts = new Array[Long](nLab)
    val qOf = new Array[Long](nLab)
    var i = 0
    while (i < t.height) {
      var j = 0
      while (j < t.width) {
        val k = i * t.width + j
        if (lab(k) >= 0) {
          val l = lab(k)
          qOf(l) = q(k)
          var j1 = j
          while (j1 + 1 < t.width && lab(i * t.width + j1 + 1) == l) j1 += 1
          counts(l) += (j1 - j + 1)
          val x0 = t.xmin + j * t.xres; val x1 = t.xmin + (j1 + 1) * t.xres
          val y1 = t.ymax - i * t.yres; val y0 = t.ymax - (i + 1) * t.yres
          runs(l) += gf.createPolygon(Array(
            new Coordinate(x0, y0), new Coordinate(x1, y0),
            new Coordinate(x1, y1), new Coordinate(x0, y1), new Coordinate(x0, y0)))
          j = j1 + 1
        } else j += 1
      }
      i += 1
    }
    val w = new WKTWriter()
    val tileIdx = t.tile_row.toLong * 4096 + t.tile_col
    (0 until nLab).map { l =>
      val geoms = new java.util.ArrayList[Geometry]()
      runs(l).foreach(geoms.add)
      val u = if (geoms.size == 1) geoms.get(0) else CascadedPolygonUnion.union(geoms)
      Partial(gid(tileIdx, l), qOf(l), counts(l), w.write(u))
    }
  }

  // ---- the operator ----------------------------------------------------

  /** target: None = polygonize every distinct value (the reference's
    * target=all); Some((lo, hi)) = only cells with lo ≤ value ≤ hi,
    * labeled as one boolean class (the reference's scalar/range targets +
    * boolean-labeling fast path, `vectorization.py:233-314`). */
  def polygonize(tiles: Dataset[RasterTile], conn: Int = 4,
                 atol: Double = 1e-6,
                 target: Option[(Double, Double)] = None): DataFrame = {
    require(conn == 4 || conn == 8, s"connectivity must be 4 or 8, got $conn")
    val spark = tiles.sparkSession
    import spark.implicits._

    // labeled tiles cached: both the seam phase and the polygon phase read
    // them; labeling is the expensive kernel.
    val labeled = tiles.map { t =>
      val d = TileCodec.unpackDoubles(t.data)
      val valid0 = TileCodec.unpackMask(t.mask, d.length)
      val valid = target match {
        case None => valid0
        case Some((lo, hi)) =>
          val v = new Array[Boolean](d.length)
          var k = 0
          while (k < d.length) { v(k) = valid0(k) && d(k) >= lo && d(k) <= hi; k += 1 }
          v
      }
      val q = new Array[Long](d.length)
      // boolean fast path: a single class for range targets
      val boolMode = target.isDefined
      var k = 0
      while (k < d.length) {
        if (valid(k)) q(k) = if (boolMode) 1L else canon(d(k), atol)
        k += 1
      }
      val (lab, n) = labelTile(q, valid, t.width, t.height, conn)
      (t, q, lab, n)
    }.persist()

    // --- seam pairs: border strips joined across adjacent tiles ---
    // Seam lines are keyed by the GRID LINE they sit on (vertical seams by
    // the column boundary index, horizontal by the row boundary index) with
    // positions in global pixel coordinates — so conn=8 corner adjacency
    // works even across diagonal tile pairs.
    val borders = labeled.flatMap { case (t, q, lab, _) =>
      val tileIdx = t.tile_row.toLong * 4096 + t.tile_col
      val out = mutable.ArrayBuffer.empty[(String, Long, Long, Long, Long)]
      var j = 0
      while (j < t.width) {
        val kT = j; val kB = (t.height - 1) * t.width + j
        val gcol = t.tile_col.toLong * t.width + j
        // top edge sits below horizontal grid line tile_row
        if (lab(kT) >= 0) out += (("h-", t.tile_row.toLong, gcol, q(kT), gid(tileIdx, lab(kT))))
        // bottom edge sits above horizontal grid line tile_row+1
        if (lab(kB) >= 0) out += (("h+", t.tile_row.toLong + 1, gcol, q(kB), gid(tileIdx, lab(kB))))
        j += 1
      }
      var i = 0
      while (i < t.height) {
        val kL = i * t.width; val kR = i * t.width + t.width - 1
        val grow = t.tile_row.toLong * t.height + i
        if (lab(kL) >= 0) out += (("v-", t.tile_col.toLong, grow, q(kL), gid(tileIdx, lab(kL))))
        if (lab(kR) >= 0) out += (("v+", t.tile_col.toLong + 1, grow, q(kR), gid(tileIdx, lab(kR))))
        i += 1
      }
      out
    }.toDF("side", "line", "pos", "q", "label")

    def seamPairs(sideA: String, sideB: String, offsets: Seq[Int]) = {
      val a = borders.where($"side" === sideA)
        .select($"line".as("line_a"), $"pos".as("pos_a"), $"q".as("q_a"), $"label".as("lab_a"))
      val bb = borders.where($"side" === sideB)
        .select($"line".as("line_b"), $"pos".as("pos_b"), $"q".as("q_b"), $"label".as("lab_b"))
      offsets.map { off =>
        a.join(bb, $"line_a" === $"line_b" && $"pos_a" + off === $"pos_b" &&
                   $"q_a" === $"q_b")
          .select($"lab_a", $"lab_b")
      }.reduce(_ unionByName _)
    }

    val offs = if (conn == 8) Seq(-1, 0, 1) else Seq(0)
    // cells ABOVE a horizontal line (h+) meet cells BELOW it (h-);
    // cells LEFT of a vertical line (v+) meet cells RIGHT of it (v-).
    val pairs = seamPairs("h+", "h-", offs).unionByName(seamPairs("v+", "v-", offs))
      .distinct().collect() // seam data is tiny (O(perimeter))

    // --- driver union-find over seam pairs ---
    val parent = mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) { val pp = parent.getOrElse(p, p); parent(x) = pp; x = p; p = pp }
      x
    }
    pairs.foreach { row =>
      val (a, bl) = (row.getLong(0), row.getLong(1))
      val (ra, rb) = (find(a), find(bl))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val mapping = parent.keys.map(k => k -> find(k)).toMap
    val bc = spark.sparkContext.broadcast(mapping)

    // --- per-tile partial polygons, then dissolve by global component ---
    val partials = labeled.flatMap { case (t, q, lab, n) =>
      tilePolygons(t, lab, n, q)
    }

    val withComp = partials
      .map(p => (bc.value.getOrElse(p.label, p.label), p.q, p.nCells, p.wkt))
      .toDF("component_id", "q", "n_cells", "wkt")

    val valueCol = if (target.isDefined) lit(1.0) else $"q" * atol
    withComp.groupBy($"component_id")
      .agg(first($"q").as("q"), sum($"n_cells").as("n_cells"),
           st_union_agg($"wkt").as("wkt"))
      .select($"component_id", valueCol.as("raster_value"), $"n_cells", $"wkt")
  }
}
