package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed id assignment without single-partition windows. */
object Ids {

  /** Global dense 1..N rank of rows by `orderCols`, computed WITHOUT a
    * global-window `row_number()` (which funnels all rows through one
    * task): range-repartition on the keys, per-range `row_number`, plus
    * broadcast per-range offsets (one tiny row per partition).
    *
    * Deterministic for any total order: whatever boundaries the range
    * sampler picks, ordered ranges + in-range ranks compose to the same
    * global rank. Rows with EQUAL keys may swap ranks across runs — they
    * are interchangeable by construction (callers order by all
    * content-bearing columns).
    */
  def denseIndex(df: DataFrame, orderCols: Seq[Column], out: String,
                 numRanges: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numRanges > 0) numRanges
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // materialize BEFORE counting: repartitionByRange re-SAMPLES
    // boundaries on every execution, so without materialization the
    // offsets (counted in job 1) would describe different ranges than the
    // window sees (job 2). Checkpoint rather than persist(): a persisted
    // block lost to executor failure would RECOMPUTE with freshly sampled
    // boundaries and silently corrupt ranks (checkpoint fails loud, or
    // recovers under spark.graft.checkpoint.reliable=true), and the
    // returned frame doesn't pin a cache-registry entry for the session
    // lifetime — localCheckpoint blocks free with the RDD reference.
    // (Reliable-mode checkpoint FILES are only reclaimed when the cluster
    // sets spark.cleaner.referenceTracking.cleanCheckpoints=true — see
    // Checkpoints scaladoc; materialize() warns if it is unset.)
    val ranged = Checkpoints.materialize(
      df.repartitionByRange(n, orderCols: _*)
        .withColumn("__rng", spark_partition_id()))
    val counts = ranged.groupBy(col("__rng")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)
    val offMap = counts.map(_._1).zip(offsets).toMap
    val offOf = udf((p: Int) => offMap.getOrElse(p, 0L))
    val w = Window.partitionBy(col("__rng")).orderBy(orderCols: _*)
    ranged.withColumn(out, offOf(col("__rng")) + row_number().over(w))
      .drop("__rng")
  }
}
