package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch
import graft.ops.RangeJoin

/** Interval (range) join + KMV distinct-count sketch. */
class Ops19Spec extends SparkSpec {

  test("intervalJoin: golden matches, inclusive bounds, multi-match, degenerate dropped") {
    import spark.implicits._
    val pts = (1L to 20L).map(t => (t, s"p$t")).toDF("d", "pid")
    val iv = Seq(("a", 0L, 5L), ("b", 4L, 9L), ("c", 18L, 30L),
      ("bad", 7L, 3L)) // end < start: matches nothing
      .toDF("iid", "d0", "d1")
    val got = RangeJoin.intervalJoin(pts, "d", iv, "d0", "d1", bucket = 3)
      .select(col("pid"), col("iid"))
    val exp = (for {
      t <- 1L to 20L
      (i, lo, hi) <- Seq(("a", 0L, 5L), ("b", 4L, 9L), ("c", 18L, 30L))
      if t >= lo && t <= hi
    } yield Seq[Any](s"p$t", i)).toSet
    assert(rowSet(got) == exp) // includes both endpoints and the 4,5 double-match
    assert(exp.count(_(1) == "a") == 5 && exp.count(_(1) == "b") == 6)
  }

  test("intervalJoin: partition invariance and bucket-size invariance") {
    import spark.implicits._
    val pts = (0L until 500L).map(t => (t * 7 % 400, t)).toDF("d", "pid")
    val iv = (0L until 40L).map(i => (i, i * 11, i * 11 + 25)).toDF("iid", "d0", "d1")
    def run(p: org.apache.spark.sql.DataFrame, b: Long) =
      rowSet(RangeJoin.intervalJoin(p, "d", iv, "d0", "d1", b)
        .select(col("pid"), col("iid")))
    val base = run(pts.repartition(1), 16)
    assert(run(pts.repartition(16), 16) == base)
    assert(run(pts, 1) == base && run(pts, 1000) == base,
      "bucket size changes the plan, never the result")
  }

  test("intervalJoin plans as a bucket equi-join — no nested-loop/cartesian") {
    import spark.implicits._
    val pts = (0L to 100L).map(t => (t, t)).toDF("d", "pid")
    val iv = (0L to 30L).map(i => (i, i * 3, i * 3 + 8)).toDF("iid", "d0", "d1")
    val plan = RangeJoin.intervalJoin(pts, "d", iv, "d0", "d1", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("KMV: exact below saturation, duplicate-insensitive") {
    import spark.implicits._
    val sk = udaf(new KmvSketch(128))
    val ids = (1L to 50L).toDF("id")
    val once = ids.agg(sk(col("id")).as("s")).select(col("s.*")).head()
    assert(once.getLong(0) == 50L && once.getDouble(2) == 50.0)
    // every row duplicated 4x: identical sketch
    val dup = ids.union(ids).union(ids).union(ids)
      .agg(sk(col("id")).as("s")).select(col("s.*")).head()
    assert(dup == once)
  }

  test("KMV: saturated estimate within 10% at 20k distinct, k=256") {
    import spark.implicits._
    val sk = udaf(new KmvSketch(256))
    val r = spark.range(20000).toDF("id")
      .agg(sk(col("id")).as("s")).select(col("s.*")).head()
    assert(r.getLong(0) == 256L)
    val est = r.getDouble(2)
    assert(math.abs(est / 20000.0 - 1.0) < 0.10, s"est=$est")
  }

  test("KMV: sketch is bit-identical under any partitioning (merge is a set op)") {
    import spark.implicits._
    val sk = udaf(new KmvSketch(64))
    def run(n: Int) = spark.range(5000).toDF("id").repartition(n)
      .agg(sk(col("id")).as("s")).select(col("s.*")).head()
    assert(run(1) == run(32))
  }

  test("KMV permutation-hash mode: kth and estimate replay the closed form") {
    import spark.implicits._
    val p = 1000000007L
    val sk = udaf(new KmvSketch(8, id => (id * 2654435761L) % p, p.toDouble))
    val ids = (1L to 1000L).toDF("id")
    val r = ids.agg(sk(col("id")).as("s")).select(col("s.*")).head()
    val hashes = (1L to 1000L).map(id => (id * 2654435761L) % p).distinct.sorted
    assert(r.getLong(0) == 8L && r.getLong(1) == hashes(7))
    assert(r.getDouble(2) == 7.0 * p.toDouble / hashes(7).toDouble)
  }
}
