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
    // Envelope + rectangle flag from ONE cached parse per polygon
    // (st_env_rect; round 5 parsed each wkt three times — envelope,
    // rect flag, cover — and ran the whole polygon side TWICE through a
    // rect/general branch pair, which cost a second scan + annotate pass
    // and a second join even when one branch was empty). Single join:
    //  - the exchange carries four flat envelope doubles + `gen_geom`,
    //    which is NULL for rectangles (a null bit, not a string) — the
    //    geometry string still never rides the shuffle for rect layers;
    //  - refine is bbox-first in codegen; the JTS prepared-geometry UDF
    //    only evaluates on bbox survivors of general polygons (CASE
    //    branches are lazy in codegen).
    val annotated = polys
      .withColumn("pa", st_env_rect(col("wkt")))
      // flat envelope doubles, not struct fields: the bbox refine reads
      // them once per CANDIDATE (~10^8-10^9 at scale), and a flat column
      // is a direct UnsafeRow read where a struct field pays an extra
      // indirection
      .withColumn("e0", col("pa._1")).withColumn("e1", col("pa._2"))
      .withColumn("e2", col("pa._3")).withColumn("e3", col("pa._4"))
      .withColumn("gen_geom",
        when(col("pa._5"), lit(null).cast("string")).otherwise(col("wkt")))
      .drop("pa")
    val ptCells = points.withColumn("cell", graft.plans.CellOfExpr.cellOfNative(col("x"), col("y"), lit(level)))

    val cells = annotated.withColumn("cell",
      explode(cover_cells(col("e0"), col("e1"), col("e2"), col("e3"), lit(level))))
    // shuffle-hash with the POINT side as build: the exploded poly-cell
    // side is cover-factor× larger (60× at the kernel's level-7 boxes),
    // so building the hash relation from points and streaming poly-cells
    // probes the smaller table (candidate emission is unchanged)
    val side = if (broadcastPolys) broadcast(cells) else cells
    val left = if (broadcastPolys) ptCells else ptCells.hint("shuffle_hash")
    left.join(side, Seq("cell"), "inner")
      .where(col("x") > col("e0") && col("x") < col("e2") &&
             col("y") > col("e1") && col("y") < col("e3"))
      .where(col("gen_geom").isNull ||
             st_contains_xy(col("gen_geom"), col("x"), col("y")))
      .drop("cell", "e0", "e1", "e2", "e3", "gen_geom")
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

  /** Adaptive cover-level of an envelope (clamped to [minLvl, maxLvl]). */
  private val adLevel = udf((minx: Double, miny: Double, maxx: Double, maxy: Double,
                             perAxis: Int, minLvl: Int, maxLvl: Int) =>
    math.max(minLvl,
      graft.geo.CellIndex.coverLevel(minx, miny, maxx, maxy, perAxis, maxLvl)))

  /** Cover cells of an envelope at ONE level. */
  private val coverAt = udf((minx: Double, miny: Double, maxx: Double, maxy: Double,
                             lvl: Int) =>
    graft.geo.CellIndex.cover(minx, miny, maxx, maxy, lvl))

  /** Cover cells at EVERY level minLvl..ownLvl — the ancestor emission of
    * the hierarchical grid join (a cover cell's ancestors at level L are
    * exactly cover(env, L)). */
  private val coverUpTo = udf((minx: Double, miny: Double, maxx: Double, maxy: Double,
                               minLvl: Int, ownLvl: Int) =>
    (minLvl to ownLvl).flatMap(L =>
      graft.geo.CellIndex.cover(minx, miny, maxx, maxy, L)).toArray)

  /** Geometry⋈geometry spatial join (GeoPandas sjoin, reference
    * `vector/vector.py:935-942`), hierarchical-grid shaped for scale:
    *
    *  - ADAPTIVE per-geometry cover level (`CellIndex.coverLevel`): small
    *    geometries index finely, large ones coarsely — no single level has
    *    to fit both.
    *  - Cross-level matching without coarse-bucket blowup: the DEEPER side
    *    of a pair emits its ancestor covers down to `minLevel`, the
    *    shallower side emits its OWN level only; two equi-joins (deeper-A,
    *    strictly-deeper-B) catch every envelope-overlapping pair exactly
    *    at level min(lvl_a, lvl_b).
    *  - SINGLE-CELL pair emission: a pair colliding in k shared cells is
    *    kept only in the canonical one — the cell owning the overlap
    *    corner (max minx, max miny) — pure codegen arithmetic, which
    *    removes the distinct shuffle entirely.
    *  - rect⊗rect fast path for intersects/contains/within (envelope
    *    algebra, no JTS); JTS refine for everything else.
    *
    * predicate ∈ {intersects, contains, within, touches, crosses,
    * overlaps, dwithin(dist)}; how ∈ {inner, left, semi, anti}
    * (`vector.py:935-942` `how=`). Output: inner/left → (id_a, id_b);
    * semi/anti → (id_a).
    *
    * `emitEnv` (inner only): also carry (env_a, rect_a, env_b, rect_b)
    * through to the output — the join computes them once per FEATURE for
    * its own cover/refine anyway, and consumers like Overlay otherwise
    * re-derive them with a WKT parse per PAIR (2 orders of magnitude more
    * parses on dense layers). env is the raw geometry envelope
    * [minx,miny,maxx,maxy]; for dwithin, env_a includes the dist expansion. */
  def sjoin(a: DataFrame, b: DataFrame, predicate: String, level: Int = 7,
            how: String = "inner", minLevel: Int = 3,
            maxCellsPerAxis: Int = 4, dist: Double = 0.0,
            emitEnv: Boolean = false): DataFrame = {
    require(Seq("intersects", "contains", "within", "touches", "crosses",
      "overlaps", "dwithin").contains(predicate), predicate)
    require(Seq("inner", "left", "semi", "anti").contains(how), how)
    require(!emitEnv || how == "inner", "emitEnv requires how=inner")
    val rectFast = Seq("intersects", "contains", "within").contains(predicate)

    val pred: (Column, Column) => Column = predicate match {
      case "intersects" => (x, y) => st_intersects(x, y)
      case "contains"   => (x, y) => st_contains(x, y)
      case "within"     => (x, y) => st_within(x, y)
      case "touches"    => (x, y) => st_touches(x, y)
      case "crosses"    => (x, y) => st_crosses(x, y)
      case "overlaps"   => (x, y) => st_overlaps(x, y)
      case "dwithin"    => (x, y) => st_dwithin(x, y, lit(dist))
    }
    // Envelopes travel as FOUR FLAT double columns per side (ea0..ea3 /
    // eb0..eb3), not arrays: the overlap/canonical/refine predicates read
    // them once per CANDIDATE (~10^8+ at scale) and a flat column is a
    // direct UnsafeRow read where an array element pays an indirection.
    // `emitEnv` consumers get the array rebuilt once per emitted PAIR.
    def e(p: String, i: Int): Column = col(s"e$p$i")
    // envelope relation for the rect⊗rect fast path
    def envPred(pa: String, pb: String): Column = predicate match {
      case "intersects" =>
        e(pa, 0) <= e(pb, 2) && e(pb, 0) <= e(pa, 2) &&
        e(pa, 1) <= e(pb, 3) && e(pb, 1) <= e(pa, 3)
      case "contains" =>
        e(pb, 0) >= e(pa, 0) && e(pb, 2) <= e(pa, 2) &&
        e(pb, 1) >= e(pa, 1) && e(pb, 3) <= e(pa, 3)
      case "within" =>
        e(pa, 0) >= e(pb, 0) && e(pa, 2) <= e(pb, 2) &&
        e(pa, 1) >= e(pb, 1) && e(pa, 3) <= e(pb, 3)
      case _ => lit(true)
    }
    // loose prefilter valid for every predicate (all imply envelope
    // intersection; side a is pre-expanded by dist for dwithin)
    def envOverlap(pa: String, pb: String): Column =
      e(pa, 0) <= e(pb, 2) && e(pb, 0) <= e(pa, 2) &&
      e(pa, 1) <= e(pb, 3) && e(pb, 1) <= e(pa, 3)

    // One cached parse per feature (st_env_rect). `gwkt` is the geometry
    // the general refine reads: NULL for rectangles — a rect's geometry IS
    // its envelope, so the refine rebuilds the WKT from env doubles on the
    // (rare) mixed pairs instead of shipping the string through the cell
    // exchange or re-joining the inputs per pair. Under dwithin the
    // envelope is dist-expanded and can't rebuild the original, so the
    // expanded side keeps its wkt.
    def annotated(df: DataFrame, id: String, wkt: String, p: String,
                  rectN: String, lvlN: String, gwktN: String, expand: Double) =
      df.withColumn("pa", st_env_rect(col(wkt)))
        .withColumn(s"e${p}0", col("pa._1") - expand)
        .withColumn(s"e${p}1", col("pa._2") - expand)
        .withColumn(s"e${p}2", col("pa._3") + expand)
        .withColumn(s"e${p}3", col("pa._4") + expand)
        .withColumn(rectN, col("pa._5"))
        .withColumn(gwktN,
          if (expand != 0.0) col(wkt)
          else when(col(rectN), lit(null).cast("string")).otherwise(col(wkt)))
        .withColumn(lvlN, adLevel(e(p, 0), e(p, 1), e(p, 2), e(p, 3),
          lit(maxCellsPerAxis), lit(minLevel), lit(level)))
        .select(col(id), e(p, 0), e(p, 1), e(p, 2), e(p, 3),
          col(rectN), col(lvlN), col(gwktN))

    // dwithin: expand ONE side's envelope by dist so cover cells + the
    // envelope prefilter capture pairs within distance
    val aAnn = annotated(a, "id_a", "wkt_a", "a", "rect_a", "lvl_a", "gwkt_a",
      if (predicate == "dwithin") dist else 0.0)
    val bAnn = annotated(b, "id_b", "wkt_b", "b", "rect_b", "lvl_b", "gwkt_b", 0.0)

    def cellsAll(df: DataFrame, p: String, lvl: String) = df.withColumn("cell",
      explode(coverUpTo(e(p, 0), e(p, 1), e(p, 2), e(p, 3),
        lit(minLevel), col(lvl))))
    def cellsOwn(df: DataFrame, p: String, lvl: String) = df.withColumn("cell",
      explode(coverAt(e(p, 0), e(p, 1), e(p, 2), e(p, 3), col(lvl))))

    // j1 matches at lvl_b (bOwn cells) ⇒ implies lvl_a ≥ lvl_b;
    // j2 restricted to strictly-deeper b so equal levels emit once
    val j1 = cellsAll(aAnn, "a", "lvl_a")
      .join(cellsOwn(bAnn, "b", "lvl_b").hint("shuffle_hash"), Seq("cell"))
    val j2 = cellsOwn(aAnn, "a", "lvl_a")
      .join(cellsAll(bAnn, "b", "lvl_b").hint("shuffle_hash"), Seq("cell"))
      .where(col("lvl_b") > col("lvl_a"))

    // canonical single-cell emission: keep the pair only in the cell that
    // owns the overlap corner at the matched (coarser) level
    val matchedLvl = least(col("lvl_a"), col("lvl_b"))
    val cand = j1.unionByName(j2)
      .where(envOverlap("a", "b"))
      .where(graft.plans.CellOfExpr.cellOfNative(
        greatest(e("a", 0), e("b", 0)),
        greatest(e("a", 1), e("b", 1)),
        matchedLvl) === col("cell"))

    val outCols = Seq(col("id_a"), col("id_b")) ++
      (if (emitEnv)
        Seq(array(e("a", 0), e("a", 1), e("a", 2), e("a", 3)).as("env_a"),
          col("rect_a"),
          array(e("b", 0), e("b", 1), e("b", 2), e("b", 3)).as("env_b"),
          col("rect_b"))
      else Nil)

    // Single-pass refine (round 6; the rect/general split into two
    // subplans re-joined a and b per general pair — two extra shuffle
    // joins even when the general set was empty): rect⊗rect fast pairs
    // resolve by envelope algebra in codegen; every other pair runs the
    // JTS predicate on gwkt, with a NULL rect side rebuilt from its
    // envelope (same geometry, so the boolean is identical). CASE
    // branches are lazy in codegen — rect pairs never build a string.
    def envWkt(p: String): Column =
      concat(lit("POLYGON (("), e(p, 0), lit(" "), e(p, 1), lit(", "),
        e(p, 2), lit(" "), e(p, 1), lit(", "), e(p, 2), lit(" "), e(p, 3),
        lit(", "), e(p, 0), lit(" "), e(p, 3), lit(", "),
        e(p, 0), lit(" "), e(p, 1), lit("))"))
    val rectFastPair = col("rect_a") && col("rect_b") && lit(rectFast)
    val pairs = cand
      .where(when(rectFastPair, envPred("a", "b"))
        .otherwise(pred(coalesce(col("gwkt_a"), envWkt("a")),
                        coalesce(col("gwkt_b"), envWkt("b")))))
      .select(outCols: _*)
    how match {
      case "inner" => pairs
      case "left"  => a.select(col("id_a")).join(pairs, Seq("id_a"), "left")
      case "semi"  => a.select(col("id_a")).join(pairs, Seq("id_a"), "left_semi")
      case "anti"  => a.select(col("id_a")).join(pairs, Seq("id_a"), "left_anti")
    }
  }

  /** Salted PIP for skewed cell distributions (north rule): replicate each
    * polygon-cell row `salt` ways, key points by pmod(hash, salt) — hot
    * cells fan out across `salt` reducers. */
  def pipSalted(points: DataFrame, polys: DataFrame, level: Int, salt: Int): DataFrame = {
    // single-join form of [[pip]] (same one-parse annotation, same lazy
    // CASE refine), with the polygon-cell rows replicated `salt` ways and
    // points keyed by a deterministic hash salt
    val annotated = polys
      .withColumn("pa", st_env_rect(col("wkt")))
      .withColumn("gen_geom",
        when(col("pa._5"), lit(null).cast("string")).otherwise(col("wkt")))
    val ptCells = points
      .withColumn("cell", graft.plans.CellOfExpr.cellOfNative(col("x"), col("y"), lit(level)))
      .withColumn("salt", pmod(xxhash64(col("x"), col("y")), lit(salt)).cast("int"))

    val cells = annotated
      .withColumn("cell",
        explode(cover_cells(col("pa._1"), col("pa._2"), col("pa._3"), col("pa._4"), lit(level))))
      .withColumn("salt", explode(sequence(lit(0), lit(salt - 1))))
    // build the point side (see pip): the salted poly-cell side is
    // cover×salt times larger
    ptCells.hint("shuffle_hash").join(cells, Seq("cell", "salt"), "inner")
      .where(col("x") > col("pa._1") && col("x") < col("pa._3") &&
             col("y") > col("pa._2") && col("y") < col("pa._4"))
      .where(col("gen_geom").isNull ||
             st_contains_xy(col("gen_geom"), col("x"), col("y")))
      .drop("cell", "salt", "pa", "gen_geom")
  }
}
