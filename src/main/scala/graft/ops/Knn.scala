package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.GeoFunctions._
import graft.geo.CellIndex

/** Grid-aligned nearest-neighbor join (SURVEY.md §2.4 sjoin_nearest,
  * reference `vector/vector.py:945-971`, `interface/gridding.py:72-91`).
  *
  * Exact algorithm: candidates from the query's ring-k cell neighborhood;
  * a ring-k minimum is accepted only if it beats the distance to the
  * explored-square boundary (no closer point can hide outside); the few
  * unresolved queries fall back to a broadcast full scan. Results are
  * partition-invariant and exact.
  *
  * The ring-best aggregate feeds BOTH the resolved branch and the
  * left-anti that derives the fallback set, so it is persisted — one
  * small row per query — instead of recomputing the cell join per branch.
  */
object Knn {

  // Persist bookkeeping: each call caches one small ring-best aggregate;
  // a call with a DIFFERENT plan evicts the previous one (unpersist only
  // drops the cache — a caller still holding the old plan just
  // recomputes), so at most one cached ring-best is alive per session
  // instead of one per query ever run. A call with the SAME plan reuses
  // the live cache: unconditional eviction here defeated Spark's
  // CacheManager plan-dedup and made every repeat of an identical kNN
  // query rematerialize the ring join (q_knn_zones 1.3 s → 3.0 s warm).
  // Callers wanting a fully clean session call `clearCache()`.
  // The slot is JVM-global, so a cached frame whose SparkSession has since
  // been stopped (sequential mains in one JVM) is silently dropped, never
  // unpersisted (dead context) nor served (actions on it would fail).
  private var liveRingBest: Option[DataFrame] = None
  private def trackPersisted(df: DataFrame): DataFrame = synchronized {
    if (liveRingBest.exists(_.sparkSession.sparkContext.isStopped))
      liveRingBest = None
    liveRingBest match {
      case Some(old) if old.queryExecution.analyzed.sameResult(df.queryExecution.analyzed) =>
        old // identical ring-best plan: serve the already-materialized cache
      case _ =>
        liveRingBest.foreach(_.unpersist(false))
        df.persist(StorageLevel.MEMORY_AND_DISK)
        liveRingBest = Some(df)
        df
    }
  }
  def clearCache(): Unit = synchronized {
    liveRingBest.filterNot(_.sparkSession.sparkContext.isStopped)
      .foreach(_.unpersist(false))
    liveRingBest = None
  }

  private def boundCol(ringK: Int, cellSize: Double) = {
    val ix = floor((col("qx") - CellIndex.DefaultDomain.x0) / cellSize)
    val iy = floor((col("qy") - CellIndex.DefaultDomain.y0) / cellSize)
    val xlo = (ix - ringK) * cellSize; val xhi = (ix + ringK + 1) * cellSize
    val ylo = (iy - ringK) * cellSize; val yhi = (iy + ringK + 1) * cellSize
    least(col("qx") - xlo, xhi - col("qx"), col("qy") - ylo, yhi - col("qy"))
  }

  /** queries: (qid, qx, qy); points: (point_id, x, y).
    * Output: (qid, nn_d2) — exact squared euclidean NN distance. */
  def nearest(queries: DataFrame, points: DataFrame, level: Int, ringK: Int = 2): DataFrame = {
    val cellSize = CellIndex.DefaultDomain.cellSize(level)

    val q = queries
      .withColumn("qcell", graft.plans.CellOfExpr.cellOfNative(col("qx"), col("qy"), lit(level)))
      // distance from the query point to the edge of the explored square
      // (ring-k cells around the owning cell) — the exactness bound
      .withColumn("bound", boundCol(ringK, cellSize))

    val cand = q.withColumn("cell", explode(cell_ring(col("qcell"), lit(ringK))))
      .join(points.withColumn("cell", graft.plans.CellOfExpr.cellOfNative(col("x"), col("y"), lit(level))), Seq("cell"))
      .withColumn("d2", (col("x") - col("qx")) * (col("x") - col("qx")) +
                        (col("y") - col("qy")) * (col("y") - col("qy")))

    val ringBest = trackPersisted(cand.groupBy("qid").agg(
      min(col("d2")).as("nn_d2"), first(col("bound")).as("bound")))

    val resolved = ringBest
      .where(sqrt(col("nn_d2")) < col("bound"))
      .select(col("qid"), col("nn_d2"))

    // Fallback: queries whose ring was empty or whose minimum might be
    // beaten outside the explored square. Rare → broadcast them.
    val unresolved = queries.join(resolved, Seq("qid"), "left_anti")
    val fallback = points.crossJoin(broadcast(unresolved))
      .withColumn("d2", (col("x") - col("qx")) * (col("x") - col("qx")) +
                        (col("y") - col("qy")) * (col("y") - col("qy")))
      .groupBy("qid").agg(min(col("d2")).as("nn_d2"))

    resolved.unionByName(fallback)
  }

  /** Nearest neighbor carrying the point's `value`: returns
    * (qid, nn_d2, nn_value) with deterministic tiebreak — among equally
    * distant points, the minimum value wins (lexicographic min on
    * struct(d2, value), identical in the SQL oracle). The exactness bound
    * is STRICT so boundary-equal cases resolve via the full-scan fallback,
    * keeping the tiebreak global.
    *
    * With `cutoff` set, the caller only keeps neighbors within `cutoff`
    * (gridding's `dist_nodata_pixel` mask), so the ring is sized to cover
    * the whole cutoff disk (ringK = ceil(cutoff/cellSize) ⇒ bound ≥
    * cutoff for every query): candidates beyond cutoff are pre-filtered,
    * and a query with NO in-cutoff ring candidate is nodata by definition
    * and never triggers the full-scan fallback. Only the measure-zero
    * boundary-equality queries (sqrt(nn_d2) == bound) fall back. */
  def nearestValue(queries: DataFrame, points: DataFrame, level: Int,
                   ringK: Int = 2, cutoff: Option[Double] = None): DataFrame = {
    val cellSize = CellIndex.DefaultDomain.cellSize(level)
    val k = cutoff.fold(ringK)(c => math.max(1, math.ceil(c / cellSize).toInt))
    val q = queries
      .withColumn("qcell", graft.plans.CellOfExpr.cellOfNative(col("qx"), col("qy"), lit(level)))
      .withColumn("bound", boundCol(k, cellSize))

    def withD2(cand: DataFrame) = {
      val d = cand.withColumn("d2", (col("x") - col("qx")) * (col("x") - col("qx")) +
                                    (col("y") - col("qy")) * (col("y") - col("qy")))
      cutoff.fold(d)(c => d.where(col("d2") <= lit(c * c)))
    }
    def best(cand: DataFrame) = withD2(cand)
      .groupBy("qid")
      .agg(min(struct(col("d2"), col("value"))).as("nn"),
           first(col("bound")).as("bound"))

    val ringBest = trackPersisted(best(
      q.withColumn("cell", explode(cell_ring(col("qcell"), lit(k))))
        .join(points.withColumn("cell", graft.plans.CellOfExpr.cellOfNative(col("x"), col("y"), lit(level))), Seq("cell"))))
    val resolved = ringBest.where(sqrt(col("nn.d2")) < col("bound"))
      .select(col("qid"), col("nn.d2").as("nn_d2"), col("nn.value").as("nn_value"))

    // cutoff mode: only ring-candidates that failed the strict bound are
    // candidates for fallback; empty-ring queries are nodata and dropped.
    val unresolved = cutoff match {
      case Some(_) =>
        ringBest.where(!(sqrt(col("nn.d2")) < col("bound"))).select(col("qid"))
          .join(q, Seq("qid"))
          .select(col("qid"), col("qx"), col("qy"), col("bound"))
      case None =>
        q.join(resolved, Seq("qid"), "left_anti")
          .select(col("qid"), col("qx"), col("qy"), col("bound"))
    }
    val fallback = best(points.crossJoin(broadcast(unresolved)))
      .select(col("qid"), col("nn.d2").as("nn_d2"), col("nn.value").as("nn_value"))

    resolved.unionByName(fallback)
  }
}
