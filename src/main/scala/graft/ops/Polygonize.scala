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
  * (the reference's largest op, `interface/vectorization.py`). All three
  * chunked strategies (`vectorization.py:1680-1710`, halo table `:286-296`):
  *
  *  - `label_union`   — per-tile labeling, pixel seam scan → union-find,
  *                      dissolve by global id (`:824-1101`)
  *  - `label_stitch`  — per-tile labeling + per-tile polygons, then VECTOR
  *                      stitching: cross-tile polygon adjacency within each
  *                      value group (`:1476-1553`); conn=4 requires shared
  *                      boundary length > 0, conn=8 accepts corner touch
  *  - `geometry_stitch` — no cross-seam labeling: polygonize each tile on a
  *                      1-px halo window, clip back to the tile interior
  *                      (`:1396-1460`), then the same vector stitching
  *
  * All three produce identical ring sets (the reference's
  * `test_vectorization.py:409-497` invariant, mirrored in PolygonizeSpec).
  *
  * Component resolution: seam/adjacency pairs collect to a driver
  * union-find while the pair count is small (O(tile perimeter) — the same
  * trade the reference makes at `vectorization.py:1100-1101`); above
  * `ufThreshold` they resolve DISTRIBUTED via iterative hash-min label
  * propagation (no driver materialization — the 10^7-tile path).
  */
object Polygonize extends Serializable {

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

  /** Max tiles per row/col under the gid packing below. */
  val MaxTileCols = 1 << 20

  /** Global label id: tile linear index in the high bits (20-bit column,
    * 24-bit local label ⇒ up to 2^20 tile rows × 2^20 cols). */
  @inline private def gid(tileIdx: Long, local: Int): Long = (tileIdx << 24) | local

  @inline private def tileIdxOf(t: RasterTile): Long = {
    require(t.tile_col < MaxTileCols && t.tile_row < MaxTileCols,
      s"tile (${t.tile_row},${t.tile_col}) exceeds gid packing capacity $MaxTileCols")
    t.tile_row.toLong * MaxTileCols + t.tile_col
  }

  final case class Partial(label: Long, q: Long, nCells: Long, wkt: String,
                           tile_row: Int, tile_col: Int, border: Boolean)

  /** Row-run rectangles of one tile's label image, unioned per label.
    * `border(l)` = label l touches the tile edge (stitch candidate). */
  private[ops] def tilePolygons(t: RasterTile, lab: Array[Int], nLab: Int,
                                q: Array[Long]): Seq[Partial] = {
    val gf = new GeometryFactory()
    val runs = Array.fill(nLab)(mutable.ArrayBuffer.empty[Geometry])
    val counts = new Array[Long](nLab)
    val qOf = new Array[Long](nLab)
    val border = new Array[Boolean](nLab)
    var i = 0
    while (i < t.height) {
      var j = 0
      while (j < t.width) {
        val k = i * t.width + j
        if (lab(k) >= 0) {
          val l = lab(k)
          qOf(l) = q(k)
          if (i == 0 || i == t.height - 1 || j == 0 || j == t.width - 1) border(l) = true
          var j1 = j
          while (j1 + 1 < t.width && lab(i * t.width + j1 + 1) == l) j1 += 1
          if (j1 == t.width - 1) border(l) = true
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
    val tileIdx = tileIdxOf(t)
    // labels with zero runs can occur when the label image is a view of a
    // larger window (geometry_stitch interior clip) — skip them
    (0 until nLab).filter(l => runs(l).nonEmpty).map { l =>
      val geoms = new java.util.ArrayList[Geometry]()
      runs(l).foreach(geoms.add)
      val u = if (geoms.size == 1) geoms.get(0) else CascadedPolygonUnion.union(geoms)
      Partial(gid(tileIdx, l), qOf(l), counts(l), w.write(u),
        t.tile_row, t.tile_col, border(l))
    }
  }

  // ---- connected components over a label-pair edge list ------------------

  /** Resolve components of the pair graph. Small pair sets collect to a
    * driver union-find (O(perimeter) data, as the reference gathers seam
    * pairs, `vectorization.py:1100-1101`); larger ones run ITERATIVE
    * hash-min label propagation fully distributed — each round every node
    * adopts the min component among itself and its neighbors, converging
    * in O(graph diameter) rounds without materializing anything
    * driver-side. Diameter here is the tile-adjacency diameter of a
    * component (a component snaking across k tiles converges in O(k)
    * rounds of 2 shuffles each); should profiling ever surface a
    * pathological snake, the standard large-star/small-star contraction
    * drops this to O(log n) rounds with the same join primitives.
    * Returns (label, comp). */
  private[ops] def components(pairs: DataFrame, ufThreshold: Long): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = pairs.toDF("lab_a", "lab_b").persist()
    val nPairs = p.count()
    if (nPairs <= ufThreshold) {
      val parent = mutable.HashMap.empty[Long, Long]
      def find(x0: Long): Long = {
        var x = x0
        var pr = parent.getOrElse(x, x)
        while (pr != x) { val pp = parent.getOrElse(pr, pr); parent(x) = pp; x = pr; pr = pp }
        x
      }
      p.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val mapping = parent.keys.map(k => k -> find(k)).toSeq
      p.unpersist()
      mapping.toDF("label", "comp")
    } else {
      // distributed hash-min propagation
      val edges = p.select($"lab_a".as("src"), $"lab_b".as("dst"))
        .unionByName(p.select($"lab_b".as("src"), $"lab_a".as("dst")))
        .persist()
      var comp = edges.select($"src".as("label")).distinct()
        .withColumn("comp", $"label").persist()
      var changed = 1L
      var round = 0
      while (changed > 0) {
        val nb = edges.join(comp.withColumnRenamed("label", "dst"), Seq("dst"))
          .groupBy($"src".as("label")).agg(min($"comp").as("nbmin"))
        val next = comp.join(nb, Seq("label"), "left")
          .select($"label", least($"comp", coalesce($"nbmin", $"comp")).as("comp"))
          .persist()
        // truncate lineage every few rounds: the iterative join otherwise
        // grows an unbounded plan. Checkpoints.materialize is
        // localCheckpoint locally, reliable checkpoint() under
        // spark.graft.checkpoint.reliable=true (cluster preemption safety)
        val mat =
          if (round % 3 == 2) {
            // the checkpoint copies next's blocks — release next's cache
            // entry too, or one full label set leaks every 3 rounds
            val m = Checkpoints.materialize(next); next.unpersist(); m
          } else next
        changed = mat.join(comp.withColumnRenamed("comp", "old"), Seq("label"))
          .where($"comp" < $"old").count()
        comp.unpersist()
        comp = mat
        round += 1
      }
      // hand back a materialized frame and drop the iteration cache — a
      // persisted return value leaks one cached dataset per call (the
      // Knn ring-best lesson); the checkpoint blocks are reclaimed with
      // the RDD, not held in the cache registry
      val out = Checkpoints.materialize(comp)
      comp.unpersist()
      edges.unpersist(); p.unpersist()
      out
    }
  }

  // ---- vector stitching (label_stitch / geometry_stitch) -----------------

  /** JTS 4-connectivity adjacency: shared boundary SEGMENT (length > 0),
    * not a corner point (`vectorization.py:1519-1531`). */
  private val edgeTouches = udf((a: String, b: String) => {
    val r = new WKTReader()
    val ga = r.read(a); val gb = r.read(b)
    ga.intersects(gb) && ga.getBoundary.intersection(gb.getBoundary).getLength > 0
  })

  /** JTS 8-connectivity adjacency: touches (corner contact suffices). */
  private val cornerTouches = udf((a: String, b: String) => {
    val r = new WKTReader()
    r.read(a).touches(r.read(b))
  })

  /** Cross-tile polygon adjacency pairs within each value group: each
    * border polygon joins border polygons of NEIGHBOR tiles only (the
    * reference's `_chunked_stitch_by_value_neighbor_blocks`,
    * `vectorization.py:1557-1661`), refined by the conn-specific JTS
    * predicate. */
  private def stitchPairs(borderPolys: DataFrame, conn: Int): DataFrame = {
    val offs = if (conn == 8)
      Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
    else Seq((-1, 0), (1, 0), (0, -1), (0, 1))
    val offsets = array(offs.map { case (dr, dc) =>
      struct(lit(dr).as("dr"), lit(dc).as("dc")) }: _*)
    val a = borderPolys.select($les("label", "lab_a"), $les("q", "q"),
      $les("wkt", "wkt_a"), $les("tile_row", "tr_a"), $les("tile_col", "tc_a"))
    val b = borderPolys
      .withColumn("o", explode(offsets))
      .select(col("label").as("lab_b"), col("q"), col("wkt").as("wkt_b"),
        (col("tile_row") + col("o.dr")).as("tr_a"),
        (col("tile_col") + col("o.dc")).as("tc_a"))
    val pred = if (conn == 8) cornerTouches else edgeTouches
    a.join(b, Seq("q", "tr_a", "tc_a"))
      .where(col("lab_a") < col("lab_b"))
      .where(pred(col("wkt_a"), col("wkt_b")))
      .select(col("lab_a"), col("lab_b"))
  }

  // tiny column-rename helper
  private def $les(c: String, as: String) = col(c).as(as)

  // ---- the operator ----------------------------------------------------

  /** target: None = polygonize every distinct value (the reference's
    * target=all); Some((lo, hi)) = only cells with lo ≤ value ≤ hi,
    * labeled as one boolean class (the reference's scalar/range targets +
    * boolean-labeling fast path, `vectorization.py:233-314`).
    * strategy ∈ {label_union, label_stitch, geometry_stitch}. */
  def polygonize(tiles: Dataset[RasterTile], conn: Int = 4,
                 atol: Double = 1e-6,
                 target: Option[(Double, Double)] = None,
                 strategy: String = "label_union",
                 ufThreshold: Long = 5000000L,
                 tileW: Int = 50, tileH: Int = 50,
                 tilesX: Int = 8, tilesY: Int = 8): DataFrame = {
    require(conn == 4 || conn == 8, s"connectivity must be 4 or 8, got $conn")
    require(Seq("label_union", "label_stitch", "geometry_stitch").contains(strategy),
      strategy)
    val spark = tiles.sparkSession
    import spark.implicits._

    def classify(t: RasterTile): (Array[Long], Array[Boolean]) = {
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
      val boolMode = target.isDefined
      var k = 0
      while (k < d.length) {
        if (valid(k)) q(k) = if (boolMode) 1L else canon(d(k), atol)
        k += 1
      }
      (q, valid)
    }

    val (partials, mapping): (Dataset[Partial], DataFrame) = strategy match {
      case "label_union" =>
        // labeled tiles cached: both the seam phase and the polygon phase
        // read them; labeling is the expensive kernel.
        val labeled = tiles.map { t =>
          val (q, valid) = classify(t)
          val (lab, n) = labelTile(q, valid, t.width, t.height, conn)
          (t, q, lab, n)
        }.persist()

        // --- seam pairs: border strips joined across adjacent tiles ---
        val borders = labeled.flatMap { case (t, q, lab, _) =>
          val tileIdx = tileIdxOf(t)
          val out = mutable.ArrayBuffer.empty[(String, Long, Long, Long, Long)]
          var j = 0
          while (j < t.width) {
            val kT = j; val kB = (t.height - 1) * t.width + j
            val gcol = t.tile_col.toLong * tileW + j
            if (lab(kT) >= 0) out += (("h-", t.tile_row.toLong, gcol, q(kT), gid(tileIdx, lab(kT))))
            if (lab(kB) >= 0) out += (("h+", t.tile_row.toLong + 1, gcol, q(kB), gid(tileIdx, lab(kB))))
            j += 1
          }
          var i = 0
          while (i < t.height) {
            val kL = i * t.width; val kR = i * t.width + t.width - 1
            val grow = t.tile_row.toLong * tileH + i
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
        val pairs = seamPairs("h+", "h-", offs).unionByName(seamPairs("v+", "v-", offs))
          .distinct()

        val parts = labeled.flatMap { case (t, q, lab, n) => tilePolygons(t, lab, n, q) }
        (parts, components(pairs, ufThreshold))

      case "label_stitch" =>
        val labeled = tiles.map { t =>
          val (q, valid) = classify(t)
          val (lab, n) = labelTile(q, valid, t.width, t.height, conn)
          (t, q, lab, n)
        }
        val parts = labeled.flatMap { case (t, q, lab, n) =>
          tilePolygons(t, lab, n, q)
        }.persist()
        val pairs = stitchPairs(parts.toDF().where($"border"), conn)
        (parts, components(pairs, ufThreshold))

      case "geometry_stitch" =>
        // 1-px halo window per tile (`vectorization.py:286-296`: halo = 1),
        // label the window, keep polygons of INTERIOR cells (the clip back
        // to block interior, `:1396-1460` — cell-aligned, so clipping the
        // window polygons to the interior rect equals building runs from
        // interior cells under the window's labels), stitch in vector space.
        val parts = Filters.withHalo(tiles, 1, tilesX, tilesY, tileW, tileH) {
          (center, pad, pvalid, pw, ph) =>
            // classify the padded window
            val n = pw * ph
            val valid = new Array[Boolean](n)
            val q = new Array[Long](n)
            val boolMode = target.isDefined
            var k = 0
            while (k < n) {
              val ok = pvalid(k) && (target match {
                case None => true
                case Some((lo, hi)) => pad(k) >= lo && pad(k) <= hi
              })
              valid(k) = ok
              if (ok) q(k) = if (boolMode) 1L else canon(pad(k), atol)
              k += 1
            }
            val (wlab, nLab) = labelTile(q, valid, pw, ph, conn)
            // interior view: lab/q arrays of the center tile under window labels
            val w = center.width; val h = center.height
            val ilab = new Array[Int](w * h)
            val iq = new Array[Long](w * h)
            var i = 0
            while (i < h) {
              var j = 0
              while (j < w) {
                val wk = (i + 1) * pw + (j + 1)
                ilab(i * w + j) = wlab(wk)
                iq(i * w + j) = q(wk)
                j += 1
              }
              i += 1
            }
            // drop window labels with no interior cells
            tilePolygons(center, ilab, nLab, iq).filter(_.nCells > 0).iterator
        }(Encoders.product[Partial]).persist()
        val pairs = stitchPairs(parts.toDF().where($"border"), conn)
        (parts, components(pairs, ufThreshold))
    }

    // --- dissolve by global component ---
    // (no broadcast hint: the mapping is tiny on the driver-UF path but
    // can be arbitrarily large on the distributed path — AQE picks)
    val withComp = partials.toDF()
      .join(mapping, Seq("label"), "left")
      .select(coalesce($"comp", $"label").as("component_id"),
        $"q", $"nCells".as("n_cells"), $"wkt")

    val valueCol = if (target.isDefined) lit(1.0) else $"q" * atol
    withComp.groupBy($"component_id")
      .agg(first($"q").as("q"), sum($"n_cells").as("n_cells"),
           st_union_agg($"wkt").as("wkt"))
      .select($"component_id", valueCol.as("raster_value"), $"n_cells", $"wkt")
  }
}
