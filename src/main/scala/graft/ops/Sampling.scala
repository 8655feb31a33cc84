package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.geo.SplitMix64

/** Chunk-invariant sampling — bit-exact port of the reference's topk
  * scheme (`stats/sampling.py:95-241`): key every element by
  * splitmix64_mix(seed ^ global_index) (`sampling.py:229`, implemented at
  * `SplitMix64.hash`), take the k smallest keys in unsigned uint64 order.
  * Results are independent of partitioning (the property the reference's
  * dask merge-topk exists to preserve, `sampling.py:307-457`) — Spark's
  * global TakeOrdered gives it directly.
  */
object Sampling {

  val smixKey = udf((idx: Long, seed: Long) => SplitMix64.hash(idx, seed))

  /** Top-k sample of rows by the deterministic key of `gidCol`. The
    * reference selects the k smallest keys in UNSIGNED uint64 order
    * (`sampling.py:229-241`); flipping the sign bit maps unsigned order
    * onto Spark's signed Long order. */
  def topk(df: DataFrame, gidCol: String, k: Int, seed: Long): DataFrame =
    df.withColumn("skey", smixKey(col(gidCol), lit(seed)))
      .orderBy(col("skey").bitwiseXOR(lit(Long.MinValue)), col(gidCol))
      .limit(k)

  /** Uniform fraction sample, partition-invariant (hash threshold). */
  def sampleFraction(df: DataFrame, gidCol: String, fraction: Double, seed: Long): DataFrame = {
    val u = udf((idx: Long, s: Long) => SplitMix64.uniform(idx, s))
    df.where(u(col(gidCol), lit(seed)) < fraction)
  }
}
