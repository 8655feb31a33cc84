package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.{WKTReader, WKTWriter}

import graft.geo.CellIndex

/** JTS-backed scalar functions (the `st_*` layer, SURVEY.md §2.12).
  *
  * Geometries travel as WKT strings between operators (BASELINE input_hint:
  * vector geometries are text WKT); executors parse lazily through a
  * bounded per-JVM prepared-geometry cache — the distributed analog of the
  * reference's per-worker STRtree/interpolator caches
  * (`interface/rasterization.py:126-139`).
  */
object GeoFunctions extends Serializable {

  @transient private lazy val gf = new GeometryFactory()

  /** Cached parse: prepared geometry + rectangle fast-path envelope. */
  private final case class Prep(geom: PreparedGeometry,
                                isRect: Boolean,
                                minx: Double, miny: Double, maxx: Double, maxy: Double)

  // Bounded cache: wkt -> Prep. Cleared wholesale when full — zones repeat
  // across millions of candidate pairs, so hit rate is high.
  @transient private lazy val prepCache =
    new java.util.concurrent.ConcurrentHashMap[String, Prep]()
  private val MaxCache = 200000

  def parse(wkt: String): Geometry = new WKTReader(gf).read(wkt)

  private def prep(wkt: String): Prep = {
    var p = prepCache.get(wkt)
    if (p == null) {
      if (prepCache.size() > MaxCache) prepCache.clear()
      val g = parse(wkt)
      val e = g.getEnvelopeInternal
      p = Prep(PreparedGeometryFactory.prepare(g), g.isRectangle,
        e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
      prepCache.put(wkt, p)
    }
    p
  }

  def prepared(wkt: String): PreparedGeometry = prep(wkt).geom

  // Reusable per-thread Point — avoids one allocation per candidate pair
  // in the PIP refine hot loop.
  @transient private lazy val localPoint =
    ThreadLocal.withInitial[org.locationtech.jts.geom.Point](() =>
      gf.createPoint(new Coordinate(0, 0)))

  /** Interior containment of a point — boundary excluded, matching the
    * strict-inequality oracle predicate. Rectangles (the common zone case)
    * short-circuit to pure envelope compares. */
  def containsXy(wkt: String, x: Double, y: Double): Boolean = {
    val p = prep(wkt)
    if (x <= p.minx || x >= p.maxx || y <= p.miny || y >= p.maxy) false
    else if (p.isRect) true
    else {
      val pt = localPoint.get()
      pt.getCoordinate.setCoordinate(new Coordinate(x, y))
      pt.geometryChanged()
      p.geom.contains(pt)
    }
  }

  val st_contains_xy = udf(containsXy _)
  val st_intersects = udf((a: String, b: String) => prepared(a).intersects(parse(b)))
  val st_contains = udf((a: String, b: String) => prepared(a).contains(parse(b)))
  val st_within = udf((a: String, b: String) => parse(a).within(parse(b)))
  val st_area = udf((wkt: String) => parse(wkt).getArea)
  val st_length = udf((wkt: String) => parse(wkt).getLength)
  val st_centroid_x = udf((wkt: String) => parse(wkt).getCentroid.getX)
  val st_centroid_y = udf((wkt: String) => parse(wkt).getCentroid.getY)
  val st_buffer = udf((wkt: String, d: Double) => new WKTWriter().write(parse(wkt).buffer(d)))
  val st_simplify = udf((wkt: String, tol: Double) =>
    new WKTWriter().write(org.locationtech.jts.simplify.DouglasPeuckerSimplifier.simplify(parse(wkt), tol)))
  val st_convex_hull = udf((wkt: String) => new WKTWriter().write(parse(wkt).convexHull()))
  val st_union2 = udf((a: String, b: String) => new WKTWriter().write(parse(a).union(parse(b))))
  val st_intersection = udf((a: String, b: String) => new WKTWriter().write(parse(a).intersection(parse(b))))
  val st_difference = udf((a: String, b: String) => new WKTWriter().write(parse(a).difference(parse(b))))
  val st_distance = udf((a: String, b: String) => parse(a).distance(parse(b)))
  val st_envelope = udf((wkt: String) => {
    val e = parse(wkt).getEnvelopeInternal
    Array(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  })
  val st_is_valid = udf((wkt: String) => parse(wkt).isValid)
  val st_is_rect = udf((wkt: String) => parse(wkt).isRectangle)
  val st_make_valid = udf((wkt: String) =>
    new WKTWriter().write(org.locationtech.jts.geom.util.GeometryFixer.fix(parse(wkt))))
  val st_npoints = udf((wkt: String) => parse(wkt).getNumPoints)

  /** Owning cell of a point at a level. */
  val cell_of = udf((x: Double, y: Double, lvl: Int) => CellIndex.cellOf(x, y, lvl))

  /** Covering cells of a bbox at a level (the Generator feeding explode). */
  val cover_cells = udf((minx: Double, miny: Double, maxx: Double, maxy: Double, lvl: Int) =>
    CellIndex.cover(minx, miny, maxx, maxy, lvl))

  /** Covering cells of a WKT geometry's envelope. */
  val geom_cover = udf((wkt: String, lvl: Int) => {
    val e = parse(wkt).getEnvelopeInternal
    CellIndex.cover(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY, lvl)
  })

  /** Ring-k cell neighborhood (kNN candidate expansion). */
  val cell_ring = udf((cell: Long, k: Int) => CellIndex.ring(cell, k))

  /** SplitMix64 keyed hash (chunk-invariant sampling key). */
  val smix_hash = udf((idx: Long, seed: Long) => graft.geo.SplitMix64.hash(idx, seed))
}
