package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the latest right row with
  * `right.ts <= left.ts` in the same key group (the event-enrichment /
  * point-in-time-lookup operator Spark lacks natively).
  *
  * Scale shape: the naive formulation is one window per key over the
  * UNION of both sides — correct, but a key with a billion rows becomes
  * one sorted task. This implementation factors the same scan into the
  * two-phase bucket pattern (cf. [[Packing]]):
  *
  *   1. both sides land in (key, time-bucket) groups; a window sorted by
  *      (ts, side, id) INSIDE each bucket carries the latest right row
  *      forward — partitions are bounded by the bucket width, not by the
  *      key's total history;
  *   2. per (key, bucket) the right side reduces to its last row (one
  *      `max(struct(ts, id, payload))` partial aggregation — struct
  *      ordering is lexicographic, so this is "latest, id-tiebroken");
  *   3. a window over the TINY bucket-summary frame carries the latest
  *      right row across buckets (`last(_, ignoreNulls)` over bucket
  *      order), so a left row whose bucket holds no earlier right row
  *      falls back to the newest right row from any earlier bucket.
  *
  * Ties: a right row AT the left row's timestamp matches (`<=`), and
  * equal timestamps break deterministically on (side, id) — right before
  * left, larger id wins among right duplicates via the struct max.
  */
object AsOf {

  /** @param payloadCol right-side value column carried to the output
    * @return left rows as (id, key, ts) + matched right (`r_id`,
    *         `r_<payloadCol>`), nulls when no right row precedes. */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           idCol: String, payloadCol: String,
           bucketSec: Long = 3600L): DataFrame = {
    require(bucketSec >= 1, s"bucketSec must be >= 1, got $bucketSec")
    val b = floor(unix_timestamp(col(tsCol)) / bucketSec).cast("long").as("b")
    val r = right.select(col(keyCol), col(tsCol), col(idCol), b,
      lit(0).as("side"), col(payloadCol).as("pay"))
    val l = left.select(col(keyCol), col(tsCol), col(idCol), b,
      lit(1).as("side"), lit(null).cast(right.schema(payloadCol).dataType).as("pay"))

    // phase 1: within-bucket carry (bounded partitions)
    val w1 = Window.partitionBy(col(keyCol), col("b"))
      .orderBy(col(tsCol), col("side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rRow = when(col("side") === 0,
      struct(col(idCol).as("rid"), col("pay").as("rpay")))
    val within = r.unionByName(l)
      .withColumn("carry", last(rRow, ignoreNulls = true).over(w1))
      .where(col("side") === 1)

    // phase 2: per-bucket last right row (partial-agg; output is one row
    // per (key, bucket) — tiny next to the inputs)
    val summary = r.groupBy(col(keyCol), col("b"))
      .agg(max(struct(col(tsCol), col(idCol).as("rid"), col("pay").as("rpay")))
        .as("last_r"))

    // phase 3: cross-bucket prefix over EVERY bucket either side touches
    val buckets = r.select(col(keyCol), col("b"))
      .unionByName(l.select(col(keyCol), col("b"))).distinct()
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = buckets.join(summary, Seq(keyCol, "b"), "left")
      .withColumn("prev_r", last(col("last_r"), ignoreNulls = true).over(w2))
      .select(col(keyCol), col("b"),
        struct(col("prev_r.rid").as("rid"), col("prev_r.rpay").as("rpay"))
          .as("prev"))

    // struct-level coalesce: a matched right row with a NULL payload must
    // not fall through to the previous bucket's payload
    val m = coalesce(col("carry"), col("prev"))
    within.join(prefix, Seq(keyCol, "b"))
      .select(col(idCol), col(keyCol), col(tsCol),
        m.getField("rid").as("r_id"),
        m.getField("rpay").as(s"r_$payloadCol"))
  }
}
