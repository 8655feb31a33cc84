package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{AsOf, Rollup}

/** As-of join: hand-computed goldens (ties, no-preceding-right,
  * cross-bucket fallback), equivalence of the two-phase bucketed plan
  * against a naive single-window reference at several bucket widths, and
  * partitioning invariance. Cell rollup: parent-sum identity, total
  * conservation, goldens.
  */
class Ops18Spec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // (key, ts, id, value)
  private val right = Seq(
    (1L, ts(10), 100L, 1.0), (1L, ts(20), 101L, 2.0),
    (1L, ts(20), 102L, 3.0), // duplicate ts: larger id must win
    (1L, ts(5000), 103L, 4.0),
    (2L, ts(50), 200L, 9.0)).toDF("user_id", "ts", "event_id", "value")
  private val left = Seq(
    (1L, ts(9), 500L), // before any right → null match
    (1L, ts(20), 501L), // tie with right ts=20 → matches (<=), id 102
    (1L, ts(4000), 502L), // bucket with no right rows → falls back to 102
    (1L, ts(6000), 503L), // after 103
    (2L, ts(49), 504L), // before user-2's only view
    (3L, ts(10), 505L) // key with no right rows at all
  ).toDF("user_id", "ts", "event_id")

  private def resultMap(df: DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap

  test("asof golden: ties, nulls, cross-bucket fallback (bucket=60s)") {
    val got = resultMap(AsOf.join(left, right, "user_id", "ts", "event_id",
      "value", bucketSec = 60L))
    assert(got(500L) === ((None, None)))
    assert(got(501L) === ((Some(102L), Some(3.0))))
    assert(got(502L) === ((Some(102L), Some(3.0))))
    assert(got(503L) === ((Some(103L), Some(4.0))))
    assert(got(504L) === ((None, None)))
    assert(got(505L) === ((None, None)))
  }

  /** Naive reference: one window per key over the union of both sides. */
  private def naiveAsof(l: DataFrame, r: DataFrame): DataFrame = {
    val rr = r.select(col("user_id"), col("ts"), col("event_id"),
      lit(0).as("side"), col("value").as("pay"))
    val ll = l.select(col("user_id"), col("ts"), col("event_id"),
      lit(1).as("side"), lit(null).cast("double").as("pay"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rr.unionByName(ll)
      .withColumn("m", last(when(col("side") === 0,
        struct(col("event_id").as("rid"), col("pay").as("rpay"))),
        ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        col("m.rid").as("r_id"), col("m.rpay").as("r_value"))
  }

  test("asof two-phase == naive single-window on real events, any bucket") {
    val ev = spark.read.parquet(s"$sf001/events.parquet")
    val clicks = ev.where(col("event_type") === "click")
    val views = ev.where(col("event_type") === "view")
    val want = rowSet(naiveAsof(clicks, views))
    for (bucket <- Seq(60L, 3600L, 86400L * 365)) {
      val got = rowSet(AsOf.join(clicks, views, "user_id", "ts", "event_id",
        "value", bucketSec = bucket)
        .select(col("event_id"), col("user_id"), col("r_id"), col("r_value")))
      assert(got === want, s"bucket=$bucket")
    }
  }

  test("asof is repartition-invariant") {
    val ev = spark.read.parquet(s"$sf001/events.parquet")
    val clicks = ev.where(col("event_type") === "click")
    val views = ev.where(col("event_type") === "view")
    val a = rowSet(AsOf.join(clicks, views, "user_id", "ts", "event_id", "value"))
    val b = rowSet(AsOf.join(clicks.repartition(16), views.repartition(3),
      "user_id", "ts", "event_id", "value"))
    assert(a === b)
  }

  test("cellRollup: parents are child sums, totals conserve, golden") {
    val pts = Seq((1.0, 1.0), (3.0, 1.0), (5.0, 5.0), (63.0, 63.0))
      .toDF("x", "y")
    val got = Rollup.cellRollup(pts, "x", "y", 4, 6).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // level 6 (cell 2): (0,0)=1, (1,0)=1, (2,2)=1, (31,31)=1
    assert(got((6, 0L, 0L)) === 1L && got((6, 1L, 0L)) === 1L)
    assert(got((6, 2L, 2L)) === 1L && got((6, 31L, 31L)) === 1L)
    // level 5 (cell 4): (0,0)=2, (1,1)=1, (15,15)=1
    assert(got((5, 0L, 0L)) === 2L && got((5, 1L, 1L)) === 1L)
    assert(got((5, 15L, 15L)) === 1L)
    // level 4 (cell 8): (0,0)=3, (7,7)=1
    assert(got((4, 0L, 0L)) === 3L && got((4, 7L, 7L)) === 1L)
  }

  test("cellRollup on real points: every level sums to the point count") {
    val pts = graft.io.GeoTables.points(spark, sf001)
    val n = pts.count()
    val byLevel = Rollup.cellRollup(pts, "x", "y", 2, 6)
      .groupBy("level").agg(sum("cnt").as("tot")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byLevel.keySet === Set(2, 3, 4, 5, 6))
    byLevel.values.foreach(v => assert(v === n))
    // parent identity at one sampled cell: level-3 cell (1,2) equals the
    // sum of its four level-4 children
    val l4 = Rollup.cellRollup(pts, "x", "y", 4, 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val l3 = Rollup.cellRollup(pts, "x", "y", 3, 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    for (((ix, iy), c) <- l3) {
      val kids = Seq((2 * ix, 2 * iy), (2 * ix + 1, 2 * iy),
        (2 * ix, 2 * iy + 1), (2 * ix + 1, 2 * iy + 1))
      assert(kids.flatMap(l4.get).sum === c, s"parent ($ix,$iy)")
    }
  }
}
