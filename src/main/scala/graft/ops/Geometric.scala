package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Geometry, GeometryFactory}
import org.locationtech.jts.io.{WKTReader, WKTWriter}

import graft.functions.GeoFunctions

/** Layer-level geometric constructions (reference `vector/geometric.py`). */
object Geometric {

  /** GeometryCollection aggregate (keeps every input geometry + vertex —
    * unlike UnionAgg, which dissolves). */
  class CollectAgg extends Aggregator[String, List[String], String] {
    def zero: List[String] = Nil
    def reduce(b: List[String], a: String): List[String] = a :: b
    def merge(a: List[String], b: List[String]): List[String] = a ::: b
    def finish(parts: List[String]): String = {
      val gf = new GeometryFactory()
      val r = new WKTReader(gf)
      // deterministic collection order regardless of partitioning
      val gs = parts.sorted.map(r.read)
      new WKTWriter().write(gf.createGeometryCollection(gs.toArray))
    }
    def bufferEncoder: Encoder[List[String]] = Encoders.kryo[List[String]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  val st_collect_agg = udaf(new CollectAgg)

  /** buffer_without_overlap (`vector/geometric.py:58-199`): buffers that
    * never overlap — the buffer ring around the dissolved layer is split
    * between features by the Voronoi tessellation of all feature vertices,
    * and each piece dissolves back to the feature it touches.
    *
    * Plan: ONE whole-layer row (collect-aggregate of the geometries — the
    * Voronoi scaffold is inherently global, exactly as the reference
    * computes it) explodes into ring pieces; the piece→feature assignment
    * (sjoin, first-match = min id) and the final dissolve stay
    * distributed. Layer CRS is used as-is (the reference's `metric=True`
    * local-UTM hop is the per-geometry `st_buffer_metric` concern).
    *
    * geoms: (geom_id, wkt). Output: (geom_id, wkt) buffer regions. */
  def bufferWithoutOverlap(geoms: DataFrame, bufferSize: Double): DataFrame = {
    val spark = geoms.sparkSession

    val pieces = geoms.agg(st_collect_agg(col("wkt")).as("collection"))
      .select(explode(ringPieces(col("collection"), lit(bufferSize))).as("piece_wkt"))
      .withColumn("piece_id", monotonically_increasing_id())

    // assign each piece to the first (min-id) feature it intersects
    val pairs = SpatialJoin.sjoin(
      pieces.select(col("piece_id").as("id_a"), col("piece_wkt").as("wkt_a")),
      geoms.select(col("geom_id").as("id_b"), col("wkt").as("wkt_b")), "intersects")
    val assigned = pairs.groupBy(col("id_a")).agg(min(col("id_b")).as("geom_id"))
      .join(pieces.select(col("piece_id").as("id_a"), col("piece_wkt")), Seq("id_a"))

    assigned.groupBy(col("geom_id"))
      .agg(Polygonize.st_union_agg(col("piece_wkt")).as("wkt"))
  }

  /** Voronoi-split buffer ring of the whole layer: buffer(dissolve(L)) −
    * dissolve(L), intersected with the Voronoi cells of L's vertices,
    * exploded to simple polygons. */
  private val ringPieces = udf((collectionWkt: String, bufferSize: Double) => {
    val gf = new GeometryFactory()
    val coll = GeoFunctions.parse(collectionWkt)
    val merged = coll.union()
    val ring = merged.buffer(bufferSize).difference(merged)
    val bound = merged.getEnvelope.buffer(bufferSize)
    val vb = new org.locationtech.jts.triangulate.VoronoiDiagramBuilder()
    vb.setSites(coll)
    vb.setClipEnvelope(bound.getEnvelopeInternal)
    val cells = vb.getDiagram(gf)
    val w = new WKTWriter()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < cells.getNumGeometries) {
      val piece = cells.getGeometryN(i).intersection(ring)
      var k = 0
      while (k < piece.getNumGeometries) {
        val g = piece.getGeometryN(k)
        if (g.getArea > 0) out += w.write(g)
        k += 1
      }
      i += 1
    }
    out.toArray
  })
}
