package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/** Point-in-polygon spatial join — the heart of the graft (SURVEY.md §2.4,
  * reference `vector/vector.py:1519-1571` create_mask /
  * `interface/rasterization.py:382-511` rasterize candidate pruning).
  *
  * Plan shape: polygons explode to covering cells (the STRtree substitute),
  * points key by owning cell, equi-join on `cell` (hash-partitioned — the
  * scalable path), then JTS prepared-geometry refine. The equi pre-join is
  * what Catalyst can shuffle/broadcast/AQE-skew-optimize; the refine is a
  * cheap scalar UDF on surviving candidates only.
  *
  * `broadcastThreshold`: when the polygon side is small (after explode),
  * hint broadcast so the point side never shuffles — the analog of the
  * reference caching one STRtree per worker.
  */
object SpatialJoin {

  /** polys must carry (wkt + bbox cols); points must carry (x, y).
    * Returns candidates refined by interior containment (boundary
    * excluded — matches the strict-inequality oracle).
    */
  def pip(points: DataFrame, polys: DataFrame, level: Int,
          broadcastPolys: Boolean = false): DataFrame = {
    // Envelope + rectangle flag computed ONCE per polygon (pre-explode),
    // then the polygon side splits:
    //  - rectangles refine with a pure codegen bbox predicate that never
    //    touches `wkt` — Catalyst prunes the geometry string out of the
    //    join entirely when downstream doesn't select it;
    //  - general polygons refine bbox-first, then the JTS prepared-geometry
    //    UDF on the (far fewer) bbox survivors.
    val annotated = polys
      .withColumn("env", st_envelope(col("wkt")))
      .withColumn("is_rect", st_is_rect(col("wkt")))
    val ptCells = points.withColumn("cell", graft.plans.CellOfExpr.cellOfNative(col("x"), col("y"), lit(level)))

    def joined(side0: DataFrame) = {
      val cells = side0.withColumn("cell", explode(geom_cover(col("wkt"), lit(level))))
      val side = if (broadcastPolys) broadcast(cells) else cells.hint("shuffle_hash")
      ptCells.join(side, Seq("cell"), "inner")
        .where(col("x") > col("env")(0) && col("x") < col("env")(2) &&
               col("y") > col("env")(1) && col("y") < col("env")(3))
    }

    val rect = joined(annotated.where(col("is_rect")))
    val gen = joined(annotated.where(!col("is_rect")))
      .where(st_contains_xy(col("wkt"), col("x"), col("y")))
    rect.unionByName(gen).drop("cell", "env", "is_rect")
  }

  /** Pure-bbox variant (axis-aligned zones): refine with codegen'd column
    * predicates, no UDF in the hot path. Used when the polygon side carries
    * (zxmin..zymax) box bounds. */
  def pipBox(points: DataFrame, boxes: DataFrame, level: Int,
             broadcastBoxes: Boolean = false): DataFrame = {
    val boxCells = boxes.withColumn("cell",
      explode(cover_cells(col("zxmin"), col("zymin"), col("zxmax"), col("zymax"), lit(level))))
    val ptCells = points.withColumn("cell", graft.plans.CellOfExpr.cellOfNative(col("x"), col("y"), lit(level)))
    val side = if (broadcastBoxes) broadcast(boxCells) else boxCells
    ptCells.join(side, Seq("cell"), "inner")
      .where(col("x") > col("zxmin") && col("x") < col("zxmax") &&
             col("y") > col("zymin") && col("y") < col("zymax"))
      .drop("cell")
  }

  /** Geometry⋈geometry spatial join (GeoPandas sjoin, reference
    * `vector/vector.py:935-942`): cell-cover equi prejoin on both sides,
    * envelope prefilter, then — exactly like `pip` — a rectangle⊗rectangle
    * fast path whose predicate is pure codegen envelope algebra (correct
    * because for rectangles intersects/contains/within ARE envelope
    * relations), with the JTS refine reserved for pairs involving a
    * general geometry. Dedup happens on (id_a, id_b) longs only; the JTS
    * branch re-fetches WKT by id so the wide strings never enter the
    * hot distinct. */
  def sjoin(a: DataFrame, b: DataFrame, predicate: String, level: Int): DataFrame = {
    val pred: (Column, Column) => Column = predicate match {
      case "intersects" => (x, y) => st_intersects(x, y)
      case "contains"   => (x, y) => st_contains(x, y)
      case "within"     => (x, y) => st_within(x, y)
    }
    // envelope relation for the rect⊗rect fast path (e = [minx,miny,maxx,maxy])
    def envPred(ea: Column, eb: Column): Column = predicate match {
      case "intersects" =>
        ea(0) <= eb(2) && eb(0) <= ea(2) && ea(1) <= eb(3) && eb(1) <= ea(3)
      case "contains" =>
        eb(0) >= ea(0) && eb(2) <= ea(2) && eb(1) >= ea(1) && eb(3) <= ea(3)
      case "within" =>
        ea(0) >= eb(0) && ea(2) <= eb(2) && ea(1) >= eb(1) && ea(3) <= eb(3)
    }
    // loose envelope prefilter valid for every predicate (all imply
    // envelope intersection)
    def envOverlap(ea: Column, eb: Column): Column =
      ea(0) <= eb(2) && eb(0) <= ea(2) && ea(1) <= eb(3) && eb(1) <= ea(3)

    def annotated(df: DataFrame, id: String, wkt: String, envN: String, rectN: String) =
      df.withColumn(envN, st_envelope(col(wkt)))
        .withColumn(rectN, st_is_rect(col(wkt)))
        .withColumn("cell", explode(geom_cover(col(wkt), lit(level))))
        .select(col(id), col(envN), col(rectN), col("cell"))

    val ac = annotated(a, "id_a", "wkt_a", "env_a", "rect_a")
    val bc = annotated(b, "id_b", "wkt_b", "env_b", "rect_b")
    val cand = ac.join(bc.hint("shuffle_hash"), Seq("cell"), "inner")
      .where(envOverlap(col("env_a"), col("env_b")))

    val rectPairs = cand.where(col("rect_a") && col("rect_b") &&
        envPred(col("env_a"), col("env_b")))
      .select(col("id_a"), col("id_b")).distinct()

    val genPairs = cand.where(!(col("rect_a") && col("rect_b")))
      .select(col("id_a"), col("id_b")).distinct()
      .join(a.select(col("id_a"), col("wkt_a")), Seq("id_a"))
      .join(b.select(col("id_b"), col("wkt_b")), Seq("id_b"))
      .where(pred(col("wkt_a"), col("wkt_b")))
      .select(col("id_a"), col("id_b"))

    rectPairs.unionByName(genPairs)
  }

  /** Salted PIP for skewed cell distributions (north rule): replicate each
    * polygon-cell row `salt` ways, key points by pmod(hash, salt) — hot
    * cells fan out across `salt` reducers. */
  def pipSalted(points: DataFrame, polys: DataFrame, level: Int, salt: Int): DataFrame = {
    val annotated = polys
      .withColumn("env", st_envelope(col("wkt")))
      .withColumn("is_rect", st_is_rect(col("wkt")))
    val ptCells = points
      .withColumn("cell", graft.plans.CellOfExpr.cellOfNative(col("x"), col("y"), lit(level)))
      .withColumn("salt", pmod(xxhash64(col("x"), col("y")), lit(salt)).cast("int"))

    def joined(side: DataFrame) = {
      val cells = side
        .withColumn("cell", explode(geom_cover(col("wkt"), lit(level))))
        .withColumn("salt", explode(sequence(lit(0), lit(salt - 1))))
      ptCells.join(cells.hint("shuffle_hash"), Seq("cell", "salt"), "inner")
        .where(col("x") > col("env")(0) && col("x") < col("env")(2) &&
               col("y") > col("env")(1) && col("y") < col("env")(3))
    }

    val rect = joined(annotated.where(col("is_rect")))
    val gen = joined(annotated.where(!col("is_rect")))
      .where(st_contains_xy(col("wkt"), col("x"), col("y")))
    rect.unionByName(gen).drop("cell", "salt", "env", "is_rect")
  }
}
