package graft

import org.apache.spark.sql.functions._
import graft.functions.HllSketch
import graft.ops.Sampling

/** HyperLogLog sketch + weighted (Efraimidis–Spirakis) sampling. */
class Ops20Spec extends SparkSpec {

  test("HLL replayable mode: registers, s_scaled, and estimate replay the closed form") {
    import spark.implicits._
    val sk = udaf(HllSketch.replayable())
    val n = 5000L
    val r = (1L to n).toDF("id").agg(sk(col("id")).as("s"))
      .select(col("s.*")).head()
    // plain-Scala replay of the same registers
    val regs = new Array[Int](256)
    (1L to n).foreach { id =>
      val h = (id * id % 1000000007L * 2654435761L + id) % 1000000007L
      val bk = (h % 256L).toInt
      val v = h / 256L
      val rk = if (v == 0) 23 else 23 - (64 - java.lang.Long.numberOfLeadingZeros(v))
      if (rk > regs(bk)) regs(bk) = rk
    }
    val zeros = regs.count(_ == 0).toLong
    val s = regs.map(r => if (r == 0) 1.0 else math.pow(2.0, -r)).sum
    assert(r.getLong(0) == zeros)
    assert(r.getDouble(1) == s) // exact dyadic sum — bit-identical
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    val raw = alpha * 65536.0 / s
    val est = if (raw <= 640.0 && zeros > 0) 256.0 * math.log(256.0 / zeros) else raw
    assert(math.abs(r.getDouble(2) - est) < 1e-9)
    assert(math.abs(est / n.toDouble - 1.0) < 0.15, s"est=$est") // ~6.5% std err at m=256
  }

  test("HLL splitmix mode: within 15% at 50k distinct, duplicate-insensitive") {
    import spark.implicits._
    val sk = udaf(HllSketch.splitmix())
    val ids = spark.range(50000).toDF("id")
    val once = ids.agg(sk(col("id")).as("s")).select(col("s.*")).head()
    assert(math.abs(once.getDouble(2) / 50000.0 - 1.0) < 0.15, s"est=${once.getDouble(2)}")
    val dup = ids.union(ids).union(ids)
      .agg(sk(col("id")).as("s")).select(col("s.*")).head()
    assert(dup == once)
  }

  test("HLL: small-range linear counting engages and stays exact vs replay") {
    import spark.implicits._
    val sk = udaf(HllSketch.splitmix())
    val r = (1L to 100L).toDF("id").agg(sk(col("id")).as("s"))
      .select(col("s.*")).head()
    val zeros = r.getLong(0)
    assert(zeros > 0) // 100 into 256 buckets must leave empties
    assert(r.getDouble(2) == 256.0 * math.log(256.0 / zeros))
    assert(math.abs(r.getDouble(2) / 100.0 - 1.0) < 0.15)
  }

  test("HLL: sketch is bit-identical under any partitioning (merge = register max)") {
    import spark.implicits._
    val sk = udaf(HllSketch.splitmix())
    def run(n: Int) = spark.range(20000).toDF("id").repartition(n)
      .agg(sk(col("id")).as("s")).select(col("s.*")).head()
    assert(run(1) == run(32))
  }

  test("weightedTopK: two-phase salted == naive single window") {
    import spark.implicits._
    val df = (0L until 800L).map(i => (s"g${i % 3}", i, (i % 17 + 1).toDouble))
      .toDF("g", "id", "w")
    val got = rowSet(Sampling.weightedTopK(df, "g", "id", "w", 15))
    // naive: one global window per group
    import org.apache.spark.sql.expressions.Window
    val hash = (col("id") * lit(2654435761L)) % lit(1000000007L)
    val t = -log((hash + lit(1L)) / lit(1000000008.0)) / col("w")
    val naive = df.withColumn("t", t)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("t").asc, col("id").asc)))
      .where(col("rk") <= 15).select(col("g"), col("id"), col("w"), col("rk"))
    assert(got == rowSet(naive))
  }

  test("weightedTopK: partition-invariant; zero/negative weights excluded") {
    import spark.implicits._
    val df = (0L until 600L).map(i =>
      (s"g${i % 2}", i, if (i % 50 == 0) 0.0 else (i % 9 + 1).toDouble))
      .toDF("g", "id", "w")
    val a = rowSet(Sampling.weightedTopK(df.repartition(1), "g", "id", "w", 10))
    val b = rowSet(Sampling.weightedTopK(df.repartition(16), "g", "id", "w", 10))
    assert(a == b)
    assert(!a.exists(r => r(1).asInstanceOf[Long] % 50 == 0)) // w=0 rows never sampled
  }

  test("weightedTopK: selection follows weight (a dominant weight is always taken)") {
    import spark.implicits._
    // one doc with weight 1e9 among 500 unit weights: P(miss) ~ k draws
    // of an exp race it loses with prob ~1e-9 each — must be selected
    val df = (0L until 500L).map(i => ("g", i, if (i == 137L) 1e9 else 1.0))
      .toDF("g", "id", "w")
    val got = Sampling.weightedTopK(df, "g", "id", "w", 5)
      .select(col("id")).as[Long].collect().toSet
    assert(got.contains(137L))
  }

  test("weightedTopK plans without a single-partition window in phase 1") {
    import spark.implicits._
    val df = (0L until 100L).map(i => ("g", i, 1.0)).toDF("g", "id", "w")
    // the analyzed plan: the optimizer constant-folds pmod into a
    // LocalRelation for literal inputs, hiding the salt key
    val plan = Sampling.weightedTopK(df, "g", "id", "w", 5)
      .queryExecution.analyzed.toString
    // phase-1 window must key on (group, salt), not group alone
    assert(plan.contains("pmod"), plan)
  }
}
