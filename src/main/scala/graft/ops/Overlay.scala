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

  /** a: (id_a, wkt_a); b: (id_b, wkt_b). Output: (id_a, id_b, wkt, area) —
    * id_a/id_b nullable depending on `how`. */
  def overlay(a: DataFrame, b: DataFrame, how: String, level: Int = 7): DataFrame = {
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
        .withColumn("env_a", st_envelope(col("wkt_a")))
        .withColumn("env_b", st_envelope(col("wkt_b")))
        .withColumn("both_rect", st_is_rect(col("wkt_a")) && st_is_rect(col("wkt_b")))
      else pairs0
    val pairs = if (fanOut) annotated0.localCheckpoint() else annotated0

    // rect⊗rect pairs intersect by pure envelope arithmetic (codegen) —
    // JTS only parses the general-geometry pairs
    lazy val inter = {
      val ann = pairs
      val x0 = greatest(col("env_a")(0), col("env_b")(0))
      val y0 = greatest(col("env_a")(1), col("env_b")(1))
      val x1 = least(col("env_a")(2), col("env_b")(2))
      val y1 = least(col("env_a")(3), col("env_b")(3))
      val rect = ann.where(col("both_rect") && x1 > x0 && y1 > y0)
        .select(col("id_a"), col("id_b"),
          concat(lit("POLYGON (("), x0, lit(" "), y0, lit(", "), x1, lit(" "), y0,
            lit(", "), x1, lit(" "), y1, lit(", "), x0, lit(" "), y1,
            lit(", "), x0, lit(" "), y0, lit("))")).as("wkt"),
          ((x1 - x0) * (y1 - y0)).as("area"))
      val gen = ann.where(!col("both_rect"))
        .select(col("id_a"), col("id_b"),
          st_intersection(col("wkt_a"), col("wkt_b")).as("wkt"))
        .withColumn("area", st_area(col("wkt")))
        .where(col("area") > 0)
      rect.unionByName(gen)
    }

    // per-feature difference: subtract the UNION of all intersecting
    // partners in one JTS call; unmatched features pass through whole
    def diffSide(src: DataFrame, idN: String, wktN: String,
                 otherIdN: String, otherWktN: String): DataFrame = {
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
