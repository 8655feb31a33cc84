package graft

import org.apache.spark.sql.functions._
import graft.functions.CmSketch
import graft.ops.Quantiles

/** Count–Min frequency sketch + HDR-histogram quantile sketch. */
class Ops21Spec extends SparkSpec {

  test("CM sketch: never underestimates, exact at collision-free width, partition-invariant") {
    import spark.implicits._
    // skewed frequencies: key i appears (i % 17) + 1 times, keys 0..199
    val rows = (0L until 200L).flatMap(i => Seq.fill((i % 17).toInt + 1)(i))
    val df = rows.toDF("k")
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cands = (0L until 200L).toDF("k")

    val est = CmSketch.estimate(df, cands, "k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.size == 200)
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"CM underestimated key $k: ${est(k)} < $c")
    }

    // width 8192 >> 200 keys: whp no collision in any of the 4 rows —
    // verify the estimate is EXACT for every key (deterministic hashes,
    // so this either always holds or never does)
    val estWide = CmSketch.estimate(df, cands, "k", w = 8192).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) => assert(estWide(k) == c) }

    // merge order / partitioning invariance
    val est16 = CmSketch.estimate(df.repartition(16), cands, "k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est16 == est)
  }

  test("CM sketch: bucket arithmetic stays in Long range for large keys") {
    // largest synthetic id times the largest multiplier must not overflow
    val maxKey = 100000000L // far above any synthetic table id
    CmSketch.A.foreach { a => assert(maxKey <= Long.MaxValue / a) }
    (0 until 4).foreach { j =>
      val b = CmSketch.bucket(maxKey, j, 512)
      assert(b >= 0 && b < 512)
    }
  }

  test("HDR bucket: monotone in x, exact below 2^(k+1), rep within 2^-k relative") {
    import spark.implicits._
    val xs = (1L to 4096L) ++ Seq(5000L, 65535L, 1L << 40, (1L << 52) - 1)
    val got = xs.toDF("x")
      .select(col("x"), Quantiles.hdrBucket(col("x"), 5).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // monotone (xs sorted ascending)
    got.sliding(2).foreach { case Array((x0, b0), (x1, b1)) =>
      assert(b0 <= b1, s"bucket not monotone at $x0->$x1: $b0 > $b1")
    }
    got.foreach { case (x, b) =>
      val shift = math.max(b / 32 - 1, 0L)
      val sub = b - shift * 32
      val lo = sub << shift
      val hi = lo + (1L << shift) // exclusive upper bound
      assert(x >= lo && x < hi, s"x=$x outside its bucket [$lo,$hi)")
      if (x < 64) assert(lo == x) // exact below 2^(k+1)
      assert((hi - lo).toDouble / lo <= 1.0 / 32 + 1e-15 || x < 64)
    }
  }

  test("HDR quantiles: rank correctness vs exact percentile, partition-invariant") {
    import spark.implicits._
    // two groups with different distributions; values are exact ints
    val a = (1L to 1000L).map(i => ("a", i * i % 9973 + 1))
    val b = (1L to 500L).map(i => ("b", i))
    val df = (a ++ b).toDF("g", "x")
    val q = Quantiles.hdrQuantiles(df, "g", col("x"), Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(q.size == 6)
    // the exact pct-th value must fall inside the chosen bucket:
    // rep <= v_exact < rep * (1 + 1/32) (or rep+1 granularity for small)
    Seq(("a", a.map(_._2)), ("b", b.map(_._2))).foreach { case (g, vsRaw) =>
      val vs = vsRaw.sorted
      Seq(50, 90, 99).foreach { pct =>
        val target = (pct * vs.length + 99) / 100 // ceil
        val exact = vs(target - 1)
        val rep = q((g, pct))
        assert(rep <= exact, s"$g p$pct rep $rep > exact $exact")
        val shift = if (rep < 64) 0 else 63 - java.lang.Long.numberOfLeadingZeros(rep) - 5
        val width = 1L << math.max(shift, 0)
        assert(exact < rep + width, s"$g p$pct exact $exact outside [$rep, ${rep + width})")
      }
    }
    val q16 = Quantiles.hdrQuantiles(df.repartition(16), "g", col("x"), Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(q16 == q)
  }
}
