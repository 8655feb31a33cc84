package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Round-5 specs: the EXACT n-gram Jaccard self-join via prefix filtering
  * (AllPairs/PPJoin). The property that matters is LOSSLESSNESS — the
  * prefix filter must return exactly the pairs a brute-force all-pairs
  * scan returns, at every threshold — plus the usual partition invariance
  * and the inclusive-threshold edge. */
class Ops14Spec extends SparkSpec {

  import spark.implicits._

  /** Driver-side replica of the operator's gram hashing: top-60-bit md5
    * prefix of the space-joined token k-gram, distinct per doc. */
  private def gramSet(text: String, k: Int): Set[Long] = {
    val ts = text.split(" ").filter(_.nonEmpty)
    if (ts.length < k) Set.empty
    else (0 to ts.length - k).map { i =>
      val g = ts.slice(i, i + k).mkString(" ")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }.toSet
  }

  private def brute(docs: Seq[(String, String)], k: Int, t: Double)
      : Map[(String, String), Double] = {
    val sets = docs.map { case (id, tx) => id -> gramSet(tx, k) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      o = sa.intersect(sb).size
      j = o.toDouble / (sa.size + sb.size - o) if o > 0 && j >= t
    } yield (a, b) -> j).toMap
  }

  private def opPairs(docs: Seq[(String, String)], k: Int, t: Double)
      : Map[(String, String), Double] = {
    val df = docs.toDF("doc_id", "text")
    TextOps.jaccardJoin(df, k, t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
  }

  // a corpus engineered for near-dups: shared 20-token base with small
  // per-doc substitutions, plus short docs (< k tokens) and disjoint docs
  private val base = (0 until 20).map(i => s"w$i")
  private val corpus: Seq[(String, String)] =
    (0 until 12).map { d =>
      val toks = base.zipWithIndex.map { case (w, i) =>
        if (i % 7 == d % 7) s"sub${d}_$i" else w
      }
      (f"d$d%03d", toks.mkString(" "))
    } ++ Seq(
      ("s001", "too short"),
      ("s002", "x"),
      ("z001", (0 until 15).map(i => s"alien$i").mkString(" ")))

  test("jaccardJoin == brute force at thresholds 0.3 / 0.5 / 0.8") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = opPairs(corpus, 3, t)
      val want = brute(corpus, 3, t)
      if (t == 0.3) assert(want.nonEmpty) // the corpus's near-dups sit at J≈0.33
      assert(got.keySet === want.keySet, s"pair set at t=$t")
      for ((p, j) <- want)
        assert(math.abs(got(p) - j) < 5e-5, s"jaccard of $p at t=$t")
    }
  }

  test("threshold is inclusive: a pair at exactly J=0.5 is kept") {
    // "x y z" has one 3-gram, "x y z w" has two sharing one: J = 1/2
    val docs = Seq(("a", "x y z"), ("b", "x y z w"))
    val at = opPairs(docs, 3, 0.5)
    assert(at === Map(("a", "b") -> 0.5))
    assert(opPairs(docs, 3, 0.51).isEmpty)
  }

  test("ceil slack: prefix stays lossless where t*s is a near-integer") {
    // s=5 grams each (7 tokens), t=0.8: ceil(0.8*5) must be 4, not 5 —
    // a binary-decimal flip would shrink the prefix and can drop pairs
    val a = "t1 t2 t3 t4 t5 t6 t7"
    val b = "t1 t2 t3 t4 t5 t6 t8" // 4 shared grams of 5: J = 4/6
    val docs = Seq(("a", a), ("b", b))
    assert(opPairs(docs, 3, 2.0 / 3.0).keySet === Set(("a", "b")))
    assert(brute(docs, 3, 2.0 / 3.0).keySet === Set(("a", "b")))
  }

  test("partition invariance: 1 vs 7 input partitions, same rows") {
    val df = corpus.toDF("doc_id", "text")
    val one = rowSet(TextOps.jaccardJoin(df.repartition(1), 3, 0.3))
    val seven = rowSet(TextOps.jaccardJoin(df.repartition(7), 3, 0.3))
    assert(one === seven && one.nonEmpty)
  }

  test("jaccardJoin plan: candidates come from an equi-join, never a cross join") {
    // the whole point of prefix filtering is avoiding the all-pairs
    // product — a plan regression to a nested-loop join would still pass
    // the correctness tests while being a scale-killer
    val df = corpus.toDF("doc_id", "text")
    val plan = TextOps.jaccardJoin(df, 3, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("jaccardJoin on the sf0.001 documents table == brute force") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").as[(String, String)].collect().toSeq
    val got = opPairs(docs, 3, 0.5)
    val want = brute(docs, 3, 0.5)
    assert(want.nonEmpty) // datagen injects near-dups at J ≥ 0.9
    assert(got.keySet === want.keySet)
    for ((p, j) <- want) assert(math.abs(got(p) - j) < 5e-5)
  }
}
