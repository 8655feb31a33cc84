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
    // drop only the DEAD sessions' frames — wiping the whole vector when
    // one context stops would leave a concurrent live session's frames
    // persisted but untracked (unbounded cache); dedup is session-scoped
    // so a plan never serves another session's cache
    liveFrames = liveFrames.filterNot(_.sparkSession.sparkContext.isStopped)
    liveFrames.find(f => (f.sparkSession eq df.sparkSession) &&
        f.queryExecution.analyzed.sameResult(df.queryExecution.analyzed)) match {
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
  private def untrack(df: DataFrame): Unit = synchronized {
    liveFrames = liveFrames.filterNot(_ eq df)
    if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
  }

  /** Test hook: the last fallback decision —
    * (unresolved count, point count, queries side broadcast?). The lazy
    * small-points path reports unresolved = -1 (never counted: the
    * nested loop is part of the consumer's single action) and always
    * broadcasts the point side. None when every query resolved within
    * the eager ring rounds (no fallback built). */
  private[graft] var lastFallback: Option[(Long, Long, Boolean)] = None

  private def boundCol(ringK: Int, cellSize: Double) = {
    // the explored square lives in DOMAIN coordinates: cell i spans
    // [x0 + i·cs, x0 + (i+1)·cs) — omitting the origin here is only
    // correct for the (0,0) default domain and silently breaks the
    // exactness bound (inflated or negative) under a configured extent
    val x0 = CellIndex.DefaultDomain.x0; val y0 = CellIndex.DefaultDomain.y0
    val ix = floor((col("qx") - x0) / cellSize)
    val iy = floor((col("qy") - y0) / cellSize)
    val xlo = lit(x0) + (ix - ringK) * cellSize
    val xhi = lit(x0) + (ix + ringK + 1) * cellSize
    val ylo = lit(y0) + (iy - ringK) * cellSize
    val yhi = lit(y0) + (iy + ringK + 1) * cellSize
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

  /** Rows at or below which a table is cheap to broadcast for the exact
    * nested-loop path ((qid,x,y,value) rows ≈ 40 B → ≤ ~40 MB). Override
    * with spark.graft.knn.broadcastRows (tests set 0 to force the ring
    * expansion rounds). */
  private def broadcastRows(df: DataFrame): Long =
    df.sparkSession.conf.getOption("spark.graft.knn.broadcastRows")
      .map(_.toLong).getOrElse(1000000L)

  /** Probe the point side for the nested-loop decision with ONE
    * early-stopping pass (`limit(threshold+1)` — a huge table stops after
    * threshold+1 rows instead of a full count). Returns (frame, count,
    * threshold); when count ≤ threshold the frame IS the complete point
    * set, persisted so the fallback reuses it — the point side is often a
    * derived subplan (e.g. a proximity transform's boundary-cell
    * extraction) and recomputing it per job dominated the transform. */
  private def probeSmall(points: DataFrame): (DataFrame, Long, Long) = {
    val thr = broadcastRows(points)
    val cap = math.min(thr + 1, Int.MaxValue.toLong - 1).toInt
    val p = trackPersisted(points.limit(cap))
    val n = p.count()
    // the big path never reads the probe again: free its cache slot
    // instead of letting ~thr dead rows evict a reusable ring aggregate
    if (n > thr) untrack(p)
    (p, n, thr)
  }

  /** queries: (qid, qx, qy); points: (point_id, x, y).
    * Output: (qid, nn_d2) — exact squared euclidean NN distance.
    *
    * Strategy by point-side size (ONE early-stopping probe job):
    *  - broadcast-small points → one LAZY ring round; unresolved queries
    *    take a nested loop against the broadcast persisted point set, all
    *    inside the consumer's single action (no driver-side counts, no
    *    query-side broadcast). A wider ring can never beat one scan of a
    *    broadcast-tiny table — blind ring doubling here was 3× slower,
    *    measured on q_proximity_vector's boundary-cell targets.
    *  - big points → EAGER ring-doubling rounds (2k, 4k; one small count
    *    per round decides the next), then a last-resort nested loop
    *    broadcasting whichever side is smaller by counted rows. */
  def nearest(queries: DataFrame, points: DataFrame, level: Int,
              ringK: Int = 2, expandRounds: Int = 2): DataFrame = {
    val cellSize = CellIndex.DefaultDomain.cellSize(level)
    val q0 = queries.select(col("qid"), col("qx"), col("qy"))
    def bestOf(qf: DataFrame, ptSide: DataFrame, k: Int): DataFrame =
      trackPersisted(ringCand(qf, withCellPts(ptSide, level), level, k, cellSize)
        .groupBy("qid").agg(min(col("d2")).as("nn_d2"), first(col("bound")).as("bound")))

    val (p, n, thr) = probeSmall(points)
    if (n <= thr) {
      // ring candidates read the PERSISTED probe frame too: the point
      // side is often a derived subplan (boundary-cell extraction), and
      // this makes it compute exactly once per call
      val best = bestOf(q0, p, ringK)
      val resolved = best.where(sqrt(col("nn_d2")) < col("bound"))
        .select(col("qid"), col("nn_d2"))
      val unresolved = q0.join(resolved, Seq("qid"), "left_anti")
      lastFallback = Some((-1L, n, false))
      resolved.unionByName(
        broadcast(p).crossJoin(unresolved).withColumn("d2", d2Col)
          .groupBy("qid").agg(min(col("d2")).as("nn_d2")))
    } else {
      var q = q0
      var k = ringK
      var resolvedAll: List[DataFrame] = Nil
      var remaining = 1L
      var r = 0
      while (r <= expandRounds && remaining > 0) {
        val best = bestOf(q, points, k)
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
        val nPts = points.count()
        // broadcast the residue only when it actually fits (the point
        // side is > thr by construction on this branch): an unresolved
        // set above the threshold takes an UNHINTED cross join — slow,
        // but it cannot OOM the driver the way a forced multi-GB
        // broadcast would
        val bq = remaining <= thr
        lastFallback = Some((remaining, nPts, bq))
        val pairs =
          if (bq) points.crossJoin(broadcast(q)) else points.crossJoin(q)
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
          ringCand(q, pts, level, k, cellSize), withBound = true))
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
        val q0 = queries.select(col("qid"), col("qx"), col("qy"))
        def bestOf(qf: DataFrame, ptSide: DataFrame, k: Int): DataFrame =
          trackPersisted(bestAgg(
            ringCand(qf, withCellPts(ptSide, level), level, k, cellSize),
            withBound = true))
        def unpack(df: DataFrame): DataFrame = df
          .select(col("qid"), col("nn.d2").as("nn_d2"), col("nn.value").as("nn_value"))

        val (p, n, thr) = probeSmall(points)
        if (n <= thr) {
          // lazy small-points path (see `nearest`): one ring round over
          // the PERSISTED probe frame, the unresolved nested-loop against
          // the same broadcast point set
          val best = bestOf(q0, p, ringK)
          val resolved = unpack(best.where(sqrt(col("nn.d2")) < col("bound")))
          val unresolved = q0.join(resolved, Seq("qid"), "left_anti")
          lastFallback = Some((-1L, n, false))
          resolved.unionByName(unpack(bestAgg(
            broadcast(p).crossJoin(unresolved).withColumn("d2", d2Col),
            withBound = false)))
        } else {
          var q = q0
          var k = ringK
          var resolvedAll: List[DataFrame] = Nil
          var remaining = 1L
          var r = 0
          while (r <= expandRounds && remaining > 0) {
            val resolved = unpack(bestOf(q, points, k).where(sqrt(col("nn.d2")) < col("bound")))
            resolvedAll ::= resolved
            q = q.join(resolved, Seq("qid"), "left_anti")
            remaining = q.count()
            k *= 2; r += 1
          }
          val res = resolvedAll.reduce(_ unionByName _)
          if (remaining == 0) { lastFallback = None; res }
          else {
            val nPts = points.count()
            // same size cap as `nearest`: never force a broadcast of an
            // over-threshold residue
            val bq = remaining <= thr
            lastFallback = Some((remaining, nPts, bq))
            val pairs =
              if (bq) points.crossJoin(broadcast(q)) else points.crossJoin(q)
            res.unionByName(unpack(bestAgg(pairs.withColumn("d2", d2Col), withBound = false)))
          }
        }
    }
  }
}
