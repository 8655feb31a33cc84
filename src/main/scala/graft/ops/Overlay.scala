package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/** Vector overlay — pairwise geometric set operations between two layers
  * (reference `vector/vector.py:974-989`, GeoPandas `overlay(how=...)`).
  *
  * how semantics (each output row carries the polygonal piece + the ids it
  * derives from; null id = "no counterpart", GeoPandas' NaN):
  *  - intersection         → a∩b pieces for every intersecting pair
  *  - difference           → per a-feature: a − union(intersecting b)
  *  - identity             → intersection ∪ difference
  *  - symmetric_difference → difference(a,b) ∪ difference(b,a)
  *  - union                → intersection ∪ difference(a,b) ∪ difference(b,a)
  *
  * Plan: one `sjoin` (cell prejoin, single-emission) builds the pair set;
  * intersection pieces compute per pair; difference pieces group the
  * intersecting partners per feature (st_union_agg) and subtract ONCE —
  * never a per-pair cascade. Features with no partner pass through whole.
  * Only polygonal parts with area > 0 are kept (the reference's
  * polygonal-only extraction).
  */
object Overlay {

  /** Exact area of an axis-aligned rectangle minus a union of axis-aligned
    * rectangles (pre-clipped to the source): coordinate-compressed slab
    * sweep, O(k² log k) per feature, no geometry materialized. A slab
    * between adjacent x-cuts is covered all-or-nothing by each cut, so the
    * per-slab interval merge is exact; on integer-coordinate rectilinear
    * inputs the result is integer-exact, matching both JTS difference area
    * and the oracle's unit-cell count bit for bit. */
  private[graft] def rectDiffArea(sx0: Double, sy0: Double, sx1: Double, sy1: Double,
                                  cuts: Array[Array[Double]]): Double = {
    if (cuts.isEmpty) return (sx1 - sx0) * (sy1 - sy0)
    val xs = (Array(sx0, sx1) ++ cuts.flatMap(c => Array(c(0), c(2)))).distinct.sorted
    var area = 0.0
    var s = 0
    while (s < xs.length - 1) {
      val xa = xs(s); val xb = xs(s + 1)
      if (xb > xa) {
        val iv = cuts.filter(c => c(0) <= xa && c(2) >= xb)
          .map(c => (c(1), c(3))).sortBy(_._1)
        var covered = 0.0
        var curLo = 0.0; var curHi = Double.NegativeInfinity; var open = false
        iv.foreach { case (lo, hi) =>
          if (!open) { curLo = lo; curHi = hi; open = true }
          else if (lo > curHi) { covered += curHi - curLo; curLo = lo; curHi = hi }
          else if (hi > curHi) curHi = hi
        }
        if (open) covered += curHi - curLo
        area += (xb - xa) * ((sy1 - sy0) - covered)
      }
      s += 1
    }
    area
  }

  /** One parse per geometry for the pair annotation: (envelope, isRect).
    * Marked non-deterministic so CollapseProject can't inline it into the
    * two field extractions and parse the WKT twice (it IS deterministic;
    * the flag only pins it to its own projection). */
  private val rectEnvUdf = udf((wkt: String) => {
    val g = graft.functions.GeoFunctions.parse(wkt)
    val e = g.getEnvelopeInternal
    (Array(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY), g.isRectangle)
  }).asNondeterministic()

  /** area(src − ∪ others): rectilinear sweep when every geometry is an
    * axis-aligned rectangle (the common zones case — zero JTS ops), JTS
    * union+difference otherwise. */
  private val diffAreaUdf = udf((srcWkt: String, others: Seq[String]) => {
    val src = graft.functions.GeoFunctions.parse(srcWkt)
    val gs = others.map(graft.functions.GeoFunctions.parse)
    if (src.isRectangle && gs.forall(_.isRectangle)) {
      val e = src.getEnvelopeInternal
      val cuts = gs.map { g =>
        val c = g.getEnvelopeInternal
        Array(math.max(c.getMinX, e.getMinX), math.max(c.getMinY, e.getMinY),
              math.min(c.getMaxX, e.getMaxX), math.min(c.getMaxY, e.getMaxY))
      }.filter(c => c(2) > c(0) && c(3) > c(1)).toArray
      rectDiffArea(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY, cuts)
    } else {
      val arr = new java.util.ArrayList[org.locationtech.jts.geom.Geometry]()
      gs.foreach(arr.add)
      val merged =
        org.locationtech.jts.operation.union.CascadedPolygonUnion.union(arr)
      src.difference(merged).getArea
    }
  })

  /** a: (id_a, wkt_a); b: (id_b, wkt_b). Output: (id_a, id_b, wkt, area) —
    * id_a/id_b nullable depending on `how`.
    *
    * `areaOnly = true` skips materializing difference geometries: the
    * difference rows carry `wkt = NULL` and the area comes from the
    * rectilinear sweep (or a single JTS union+difference for general
    * shapes). Use it when the consumer only aggregates areas — building a
    * polygon only to measure it is the dominant cost of how="union" on
    * rectangle layers. */
  def overlay(a: DataFrame, b: DataFrame, how: String, level: Int = 7,
              areaOnly: Boolean = false): DataFrame = {
    require(Seq("intersection", "union", "difference", "identity",
      "symmetric_difference").contains(how), how)

    // identity/symmetric_difference/union consume the pair set 2-3× (inter,
    // diffA, diffB) — materialize it once so the cell-cover join runs once,
    // not per branch (it is the dominant cost of the whole overlay).
    // Eager localCheckpoint, not .persist(): measured at sf0.1, lazily
    // persisted WKT pairs race their own cache population across the three
    // branches of one job (80 s), and even eager columnar caching decodes
    // the big WKT strings ~4 s per branch read; checkpointed row blocks
    // read back in ~0.1 s. Same cluster caveat as Polygonize's UF step:
    // on a real cluster swap for reliable checkpointing if executor loss
    // mid-query must be recoverable.
    val fanOut = Set("identity", "symmetric_difference", "union").contains(how)
    val needsInter = Set("intersection", "identity", "union").contains(how)
    val pairs0 = SpatialJoin.sjoin(a, b, "intersects", level)
      .join(a, Seq("id_a")).join(b, Seq("id_b"))
    // envelope/rect annotation feeds the two `inter` branches — compute it
    // BEFORE the checkpoint so the WKT-parse UDFs run once per pair, not
    // once per branch read (measured 17.3 s → 8.9 s on the union overlay)
    val annotated0 =
      if (needsInter) pairs0
        .withColumn("re_a", rectEnvUdf(col("wkt_a")))
        .withColumn("re_b", rectEnvUdf(col("wkt_b")))
        .select(col("*"),
          col("re_a._1").as("env_a"), col("re_b._1").as("env_b"),
          (col("re_a._2") && col("re_b._2")).as("both_rect"))
        .drop("re_a", "re_b")
      else pairs0
    val pairs = if (fanOut) annotated0.localCheckpoint() else annotated0

    // rect⊗rect pairs intersect by pure envelope arithmetic; JTS only runs
    // for general-geometry pairs. SINGLE PASS over `pairs` — CASE WHEN
    // short-circuits, so the rect branch never parses WKT and the pair set
    // isn't read once per branch (a rect/general split into two unioned
    // subplans re-ran the sjoin + annotation per branch when uncached)
    lazy val inter = {
      val x0 = greatest(col("env_a")(0), col("env_b")(0))
      val y0 = greatest(col("env_a")(1), col("env_b")(1))
      val x1 = least(col("env_a")(2), col("env_b")(2))
      val y1 = least(col("env_a")(3), col("env_b")(3))
      val rectWkt =
        concat(lit("POLYGON (("), x0, lit(" "), y0, lit(", "), x1, lit(" "), y0,
          lit(", "), x1, lit(" "), y1, lit(", "), x0, lit(" "), y1,
          lit(", "), x0, lit(" "), y0, lit("))"))
      pairs.select(col("id_a"), col("id_b"),
          when(col("both_rect"),
            when(x1 > x0 && y1 > y0, rectWkt).otherwise(lit(null).cast("string")))
            .otherwise(st_intersection(col("wkt_a"), col("wkt_b"))).as("wkt"),
          when(col("both_rect"),
            when(x1 > x0 && y1 > y0, (x1 - x0) * (y1 - y0)).otherwise(lit(0.0)))
            .as("rect_area"))
        .withColumn("area", coalesce(col("rect_area"), st_area(col("wkt"))))
        .where(col("area") > 0)
        .select(col("id_a"), col("id_b"), col("wkt"), col("area"))
    }

    // per-feature difference: subtract the UNION of all intersecting
    // partners in one JTS call (or, areaOnly, measure without building
    // the geometry); unmatched features pass through whole
    def diffSide(src: DataFrame, idN: String, wktN: String,
                 otherIdN: String, otherWktN: String): DataFrame =
      if (areaOnly) {
        val partners = pairs.groupBy(col(idN))
          .agg(collect_list(col(otherWktN)).as("others"))
        src.join(partners, Seq(idN), "left")
          .select(col(idN), lit(null).cast("string").as("wkt"),
            when(col("others").isNull, st_area(col(wktN)))
              .otherwise(diffAreaUdf(col(wktN), col("others"))).as("area"))
          .where(col("area") > 0)
      } else {
        val partners = pairs.groupBy(col(idN))
          .agg(Polygonize.st_union_agg(col(otherWktN)).as("others"))
        src.join(partners, Seq(idN), "left")
          .select(col(idN),
            when(col("others").isNull, col(wktN))
              .otherwise(st_difference(col(wktN), col("others"))).as("wkt"))
          .withColumn("area", st_area(col("wkt")))
          .where(col("area") > 0)
      }

    lazy val diffA = diffSide(a, "id_a", "wkt_a", "id_b", "wkt_b")
      .select(col("id_a"), lit(null).cast("long").as("id_b"), col("wkt"), col("area"))
    lazy val diffB = diffSide(b, "id_b", "wkt_b", "id_a", "wkt_a")
      .select(lit(null).cast("long").as("id_a"), col("id_b"), col("wkt"), col("area"))

    how match {
      case "intersection"         => inter.select(col("id_a"), col("id_b"), col("wkt"), col("area"))
      case "difference"           => diffA
      case "identity"             => inter.unionByName(diffA)
      case "symmetric_difference" => diffA.unionByName(diffB)
      case "union"                => inter.unionByName(diffA).unionByName(diffB)
    }
  }
}
