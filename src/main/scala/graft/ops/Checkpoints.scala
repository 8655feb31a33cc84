package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Lineage-truncation switch for fan-out subplans (SURVEY.md §2.11).
  *
  * `localCheckpoint()` stores row blocks on the executors that computed
  * them: re-reads are ~free locally (measured 0.1 s vs ~4 s columnar-cache
  * WKT decode), but the blocks die with a lost executor and — lineage
  * having been truncated — the JOB fails. That is the right default in
  * `local[...]` mode (one JVM, no executor loss) and the wrong one on a
  * preemptible 1000-executor cluster.
  *
  * Set `spark.graft.checkpoint.reliable=true` to swap every graft fan-out
  * materialization to reliable `checkpoint()` (written to
  * `spark.graft.checkpoint.dir`, default `<java.io.tmpdir>/graft-ckpt`;
  * point it at HDFS/S3 on a cluster). Reliable checkpoints survive
  * executor loss and are re-read from the DFS — slower per read, but the
  * only safe choice when the cost of recomputing the upstream plan after
  * preemption is a job failure.
  *
  * RECLAMATION (cluster deployment requirement): unlike localCheckpoint
  * blocks — which free with the RDD reference — reliable checkpoint FILES
  * are never deleted by default (`spark.cleaner.referenceTracking
  * .cleanCheckpoints` defaults to false), so iterative callers
  * (`Polygonize.components` checkpoints every few rounds, `Ids.denseIndex`,
  * every Overlay fan-out) would accumulate DFS data for the app lifetime
  * and beyond. Reliable mode therefore REQUIRES
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` in the cluster
  * SparkConf — it must be set BEFORE SparkContext start, so this library
  * can only warn (once, below), not fix it; superseded checkpoints are
  * then reclaimed by the ContextCleaner when their RDD is GC'd. Jobs that
  * die mid-run still leave files: point `spark.graft.checkpoint.dir` at a
  * per-run path and delete it after the app exits.
  */
object Checkpoints {

  def reliableMode(df: Dataset[_]): Boolean =
    df.sparkSession.conf.getOption("spark.graft.checkpoint.reliable")
      .exists(_.equalsIgnoreCase("true"))

  // one warning per JVM, not one per materialization
  private val warnedCleaner = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Materialize `df` eagerly, truncating lineage: reliable `checkpoint()`
    * under `spark.graft.checkpoint.reliable=true`, else `localCheckpoint()`. */
  def materialize(df: DataFrame): DataFrame =
    if (reliableMode(df)) {
      val sc = df.sparkSession.sparkContext
      if (!sc.getConf.getBoolean("spark.cleaner.referenceTracking.cleanCheckpoints",
            defaultValue = false) && warnedCleaner.compareAndSet(false, true))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "spark.graft.checkpoint.reliable=true without " +
          "spark.cleaner.referenceTracking.cleanCheckpoints=true: reliable " +
          "checkpoint files are NEVER reclaimed and will accumulate in " +
          "the checkpoint dir for the app lifetime and beyond. Set the " +
          "cleaner flag in the cluster SparkConf before context start.")
      if (sc.getCheckpointDir.isEmpty) {
        val dir = df.sparkSession.conf.getOption("spark.graft.checkpoint.dir")
          .getOrElse(System.getProperty("java.io.tmpdir") + "/graft-ckpt")
        sc.setCheckpointDir(dir)
      }
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)

  /** Speed-only materialization for DETERMINISTIC fan-out subplans (e.g.
    * exploded gram postings — a pure function of the input rows). Reliable
    * storage buys nothing for these: recomputation after executor loss is
    * always CORRECT, so the only question is recompute cost vs storage
    * cost. Locally, `localCheckpoint` wins (row blocks re-read ~free, and
    * a single JVM cannot lose them). On a reliable-mode cluster the
    * materialized set may be k× the corpus — writing it to DFS just to
    * save a re-scan is the wrong trade at 100 TB — so under
    * `spark.graft.checkpoint.reliable=true` this returns `df` UNCHANGED
    * and lets each consumer recompute the deterministic subplan.
    * Contrast [[materialize]], which is for fan-outs whose recomputation
    * could be INCONSISTENT (shuffle-order-dependent ids, sampled models)
    * and therefore must survive in reliable form.
    *
    * Lazy (`eager = false`): the blocks materialize when first computed
    * (localCheckpoint persists as it computes, so even two shuffle stages
    * of one action share the first computation), and plan-only inspection
    * of a frame built on top of this never runs the subplan. */
  def ephemeral[T](ds: Dataset[T]): Dataset[T] =
    if (reliableMode(ds)) ds else ds.localCheckpoint(eager = false)
}
