package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HDR-histogram-style quantile sketch (Gil Tene's HdrHistogram bucket
  * scheme; same log-bucket idea as DDSketch, Masson et al. VLDB'19, but
  * with power-of-two octaves so no float log is ever taken): positive
  * integers land in bit-length-indexed exponential ranges with 2^k
  * linear sub-buckets each, so the live bucket count is
  * O(2^k · log₂ max) — a few hundred, CONSTANT relative to input size —
  * and each bucket's representative is within 2^−k relative error.
  *
  * The whole pipeline is deterministic integer arithmetic:
  *  - bucketize (codegen): m = bit_length(x) = length(bin(x)),
  *    shift = max(m − (k+1), 0), bucket = shift·2^k + (x >>> shift) —
  *    monotone in x, so bucket order IS value order;
  *  - sketch: groupBy(group, bucket).count — partial aggregation means
  *    each task ships at most #live-buckets rows per group, never the
  *    values; this is the mergeable sketch state;
  *  - quantile: per-group cumulative walk over the tiny bucket relation;
  *    rank test is the integer cross-multiplication
  *    100·cum ≥ pct·n  ⟺  cum ≥ ⌈pct·n/100⌉ — no float boundary;
  *  - un-bucketize: shift = max(bucket div 2^k − 1, 0),
  *    sub = bucket − shift·2^k, lower-bound representative
  *    rep = sub << shift.
  *
  * vs `approx_percentile`: same one-pass constant-state shape, but
  * bit-identical under ANY partitioning or merge order (KLL/GK-style
  * sketches are merge-order-sensitive, so a plain-SQL oracle cannot
  * replay them), with a hard RELATIVE-error bound instead of a rank
  * bound. Reference analog: the percentile members of the reference's
  * stats bundle (`geoutils/stats.py` / `raster.get_stats`) at stream
  * scale.
  */
object Quantiles {

  /** Monotone HDR bucket index of positive-integer column `x` with
    * 2^k linear sub-buckets per octave. Uses length(bin(x)) for the
    * bit length — the exact expression the SQL oracle replays. The
    * bin() string is a small per-row allocation inside the scan stage;
    * it collapses at the very next partial aggregation, so the scan
    * (not this expression) dominates at scale. A float log2 would
    * avoid the allocation but risks off-by-one at exact powers of two
    * across engines — determinism wins. */
  def hdrBucket(x: Column, k: Int): Column = {
    val shift = greatest(length(bin(x)) - lit(k + 1), lit(0))
    (shift.cast("long") * lit((1 << k).toLong)) +
      call_function("shiftrightunsigned", x, shift)
  }

  /** Per-`groupCol` HDR quantiles of positive-integer expression `x`.
    * `pcts` are integer percents (e.g. 50, 90, 99). Output one row per
    * (group, pct): the selected bucket and its exact lower-bound
    * representative `rep`. */
  def hdrQuantiles(df: DataFrame, groupCol: String, x: Column,
                   pcts: Seq[Int], k: Int = 5): DataFrame = {
    val g = col(groupCol)
    val counts = df.select(g, hdrBucket(x, k).as("bucket"))
      .groupBy(g, col("bucket")).count()
    val wCum = Window.partitionBy(g).orderBy(col("bucket"))
    val wAll = Window.partitionBy(g)
    val sel = counts
      .withColumn("cum", sum(col("count")).over(wCum))
      .withColumn("n", sum(col("count")).over(wAll))
      .withColumn("pct", explode(typedLit(pcts)))
      .filter(col("cum") * lit(100L) >= col("pct") * col("n"))
      .groupBy(g, col("pct")).agg(min(col("bucket")).as("bucket"))
    val shift = greatest((col("bucket") / lit(1L << k)).cast("long") - lit(1L), lit(0L))
    val sub = col("bucket") - shift * lit(1L << k)
    sel.select(g, col("pct"), col("bucket"),
      call_function("shiftleft", sub, shift.cast("int")).as("rep"))
  }
}
