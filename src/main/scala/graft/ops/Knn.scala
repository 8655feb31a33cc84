package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.geo.CellIndex

/** Grid-aligned nearest-neighbor join (SURVEY.md §2.4 sjoin_nearest,
  * reference `vector/vector.py:945-971`, `interface/gridding.py:72-91`).
  *
  * Exact algorithm: candidates from the query's ring-k cell neighborhood;
  * a ring-k minimum is accepted only if it beats the distance to the
  * explored-square boundary (no closer point can hide outside). Queries
  * unresolved at ring k retry at 2k, 4k, … (`expandRounds` doublings);
  * only the residue after the last round takes a nested-loop fallback,
  * and that fallback broadcasts whichever side is SMALLER (counted at
  * plan-build time) — a sparse corpus therefore broadcasts its small
  * point table, never an unbounded unresolved query set. Results are
  * partition-invariant and exact at every path.
  *
  * Each round's ring-best aggregate feeds BOTH the resolved branch and
  * the anti-join that derives the next round's query set, so the
  * aggregates are persisted — one small row per query each.
  */
object Knn {

  // Persist bookkeeping: each call caches one small ring-best aggregate
  // per expansion round. The slots are bounded (FIFO above MaxLive;
  // unpersist only drops the cache — a caller still holding an evicted
  // plan just recomputes), so a session accumulates at most MaxLive
  // cached aggregates instead of one per query ever run. A call whose
  // ring-best plan EQUALS a live slot reuses the materialized cache:
  // unconditional eviction here defeated Spark's CacheManager plan-dedup
  // and made every repeat of an identical kNN query rematerialize the
  // ring join (q_knn_zones 1.3 s → 3.0 s warm). Callers wanting a fully
  // clean session call `clearCache()`.
  // The slots are JVM-global, so cached frames whose SparkSession has
  // since been stopped (sequential mains in one JVM) are silently
  // dropped, never unpersisted (dead context) nor served (actions on
  // them would fail).
  private val MaxLive = 8
  private var liveFrames: Vector[DataFrame] = Vector.empty
  private def trackPersisted(df: DataFrame): DataFrame = synchronized {
    if (liveFrames.exists(_.sparkSession.sparkContext.isStopped))
      liveFrames = Vector.empty
    liveFrames.find(_.queryExecution.analyzed.sameResult(df.queryExecution.analyzed)) match {
      case Some(old) => old // identical plan: serve the already-materialized cache
      case None =>
        if (liveFrames.length >= MaxLive) {
          liveFrames.head.unpersist(false)
          liveFrames = liveFrames.tail
        }
        df.persist(StorageLevel.MEMORY_AND_DISK)
        liveFrames :+= df
        df
    }
  }
  def clearCache(): Unit = synchronized {
    liveFrames.filterNot(_.sparkSession.sparkContext.isStopped)
      .foreach(_.unpersist(false))
    liveFrames = Vector.empty
  }

  /** Test hook: the last expansion-loop fallback decision —
    * (unresolved count, point count, queries side broadcast?); None when
    * every query resolved within the ring rounds (no fallback built). */
  private[graft] var lastFallback: Option[(Long, Long, Boolean)] = None

  private def boundCol(ringK: Int, cellSize: Double) = {
    val ix = floor((col("qx") - CellIndex.DefaultDomain.x0) / cellSize)
    val iy = floor((col("qy") - CellIndex.DefaultDomain.y0) / cellSize)
    val xlo = (ix - ringK) * cellSize; val xhi = (ix + ringK + 1) * cellSize
    val ylo = (iy - ringK) * cellSize; val yhi = (iy + ringK + 1) * cellSize
    least(col("qx") - xlo, xhi - col("qx"), col("qy") - ylo, yhi - col("qy"))
  }

  private def d2Col: Column =
    (col("x") - col("qx")) * (col("x") - col("qx")) +
    (col("y") - col("qy")) * (col("y") - col("qy"))

  private def withCellPts(points: DataFrame, level: Int): DataFrame =
    points.withColumn("cell",
      graft.plans.CellOfExpr.cellOfNative(col("x"), col("y"), lit(level)))

  /** Ring-k candidate set for query frame `q` (qid, qx, qy, …): each query
    * joined to the points of its (2k+1)² cell neighborhood, annotated with
    * `d2` and the exactness `bound`. */
  private def ringCand(q: DataFrame, pts: DataFrame, level: Int, k: Int,
                       cellSize: Double): DataFrame =
    q.withColumn("qcell",
        graft.plans.CellOfExpr.cellOfNative(col("qx"), col("qy"), lit(level)))
      .withColumn("bound", boundCol(k, cellSize))
      .withColumn("cell", explode(graft.functions.GeoFunctions.cell_ring(col("qcell"), lit(k))))
      .join(pts, Seq("cell"))
      .withColumn("d2", d2Col)

  /** queries: (qid, qx, qy); points: (point_id, x, y).
    * Output: (qid, nn_d2) — exact squared euclidean NN distance.
    * Builds the expansion plan EAGERLY (one small count per round decides
    * whether the next round / the fallback is needed at all). */
  def nearest(queries: DataFrame, points: DataFrame, level: Int,
              ringK: Int = 2, expandRounds: Int = 2): DataFrame = {
    val cellSize = CellIndex.DefaultDomain.cellSize(level)
    val pts = withCellPts(points, level)

    var q = queries.select(col("qid"), col("qx"), col("qy"))
    var k = ringK
    var resolvedAll: List[DataFrame] = Nil
    var remaining = 1L
    var r = 0
    while (r <= expandRounds && remaining > 0) {
      val best = trackPersisted(ringCand(q, pts, level, k, cellSize)
        .groupBy("qid").agg(min(col("d2")).as("nn_d2"), first(col("bound")).as("bound")))
      val resolved = best.where(sqrt(col("nn_d2")) < col("bound"))
        .select(col("qid"), col("nn_d2"))
      resolvedAll ::= resolved
      q = q.join(resolved, Seq("qid"), "left_anti")
      remaining = q.count()
      k *= 2; r += 1
    }
    val res = resolvedAll.reduce(_ unionByName _)
    if (remaining == 0) { lastFallback = None; res }
    else {
      // last resort: exact nested-loop over (remaining queries × points),
      // broadcasting the smaller side by row count
      val nPts = points.count()
      lastFallback = Some((remaining, nPts, remaining <= nPts))
      if (nPts == 0) res
      else {
        val pairs =
          if (remaining <= nPts) points.crossJoin(broadcast(q))
          else broadcast(points).crossJoin(q)
        res.unionByName(
          pairs.withColumn("d2", d2Col).groupBy("qid").agg(min(col("d2")).as("nn_d2")))
      }
    }
  }

  /** Nearest neighbor carrying the point's `value`: returns
    * (qid, nn_d2, nn_value) with deterministic tiebreak — among equally
    * distant points, the minimum value wins (lexicographic min on
    * struct(d2, value), identical in the SQL oracle). The exactness bound
    * is STRICT so boundary-equal cases resolve via the nested-loop
    * fallback, keeping the tiebreak global.
    *
    * With `cutoff` set, the caller only keeps neighbors within `cutoff`
    * (gridding's `dist_nodata_pixel` mask), so the ring is sized to cover
    * the whole cutoff disk (ringK = ceil(cutoff/cellSize) ⇒ bound ≥
    * cutoff for every query): candidates beyond cutoff are pre-filtered,
    * a query with NO in-cutoff ring candidate is nodata by definition and
    * never falls back, and only the measure-zero boundary-equality
    * queries (sqrt(nn_d2) == bound) do — a provably tiny set, so the
    * cutoff path stays fully LAZY (no counts) and broadcast-safe with a
    * single ring round. Without cutoff, the same eager ring-expansion
    * loop as `nearest` applies. */
  def nearestValue(queries: DataFrame, points: DataFrame, level: Int,
                   ringK: Int = 2, cutoff: Option[Double] = None,
                   expandRounds: Int = 2): DataFrame = {
    val cellSize = CellIndex.DefaultDomain.cellSize(level)
    val pts = withCellPts(points, level)

    def bestAgg(cand: DataFrame, withBound: Boolean): DataFrame = {
      val filtered = cutoff.fold(cand)(c => cand.where(col("d2") <= lit(c * c)))
      val g = filtered.groupBy("qid")
      if (withBound)
        g.agg(min(struct(col("d2"), col("value"))).as("nn"), first(col("bound")).as("bound"))
      else
        g.agg(min(struct(col("d2"), col("value"))).as("nn"))
    }

    cutoff match {
      case Some(c) =>
        val k = math.max(1, math.ceil(c / cellSize).toInt)
        val q = queries.select(col("qid"), col("qx"), col("qy"))
        val ringBest = trackPersisted(bestAgg(
          ringCand(queries, pts, level, k, cellSize), withBound = true))
        val resolved = ringBest.where(sqrt(col("nn.d2")) < col("bound"))
          .select(col("qid"), col("nn.d2").as("nn_d2"), col("nn.value").as("nn_value"))
        // only ring-candidates that failed the strict bound fall back;
        // empty-ring queries are nodata and dropped
        val unresolved = ringBest.where(!(sqrt(col("nn.d2")) < col("bound")))
          .select(col("qid"))
          .join(q, Seq("qid"))
          .select(col("qid"), col("qx"), col("qy"))
        val fallback = bestAgg(
          points.crossJoin(broadcast(unresolved)).withColumn("d2", d2Col),
          withBound = false)
          .select(col("qid"), col("nn.d2").as("nn_d2"), col("nn.value").as("nn_value"))
        resolved.unionByName(fallback)

      case None =>
        var q = queries.select(col("qid"), col("qx"), col("qy"))
        var k = ringK
        var resolvedAll: List[DataFrame] = Nil
        var remaining = 1L
        var r = 0
        while (r <= expandRounds && remaining > 0) {
          val best = trackPersisted(bestAgg(
            ringCand(q, pts, level, k, cellSize), withBound = true))
          val resolved = best.where(sqrt(col("nn.d2")) < col("bound"))
            .select(col("qid"), col("nn.d2").as("nn_d2"), col("nn.value").as("nn_value"))
          resolvedAll ::= resolved
          q = q.join(resolved, Seq("qid"), "left_anti")
          remaining = q.count()
          k *= 2; r += 1
        }
        val res = resolvedAll.reduce(_ unionByName _)
        if (remaining == 0) { lastFallback = None; res }
        else {
          val nPts = points.count()
          lastFallback = Some((remaining, nPts, remaining <= nPts))
          if (nPts == 0) res
          else {
            val pairs =
              if (remaining <= nPts) points.crossJoin(broadcast(q))
              else broadcast(points).crossJoin(q)
            res.unionByName(bestAgg(pairs.withColumn("d2", d2Col), withBound = false)
              .select(col("qid"), col("nn.d2").as("nn_d2"), col("nn.value").as("nn_value")))
          }
        }
    }
  }
}
