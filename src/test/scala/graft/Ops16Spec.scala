package graft

import org.apache.spark.sql.functions._
import graft.ops.Packing

/** Sequence packing + token-budget mixing: hand-computed straddle goldens,
  * equivalence of the two-phase distributed scan against the naive global
  * window, bucket-count and partitioning invariance, and edge cases
  * (empty input, empty docs, single bucket).
  */
class Ops16Spec extends SparkSpec {

  import spark.implicits._

  // n_tokens: doc0=3, doc1=4, doc2=2 → cum 3, 7, 9
  private val tiny = Seq(
    (0L, "a b c"), (1L, "d e f g"), (2L, "h i")).toDF("doc_id", "text")

  test("pack golden: straddles split exactly at window boundaries (L=4)") {
    val got = rowSet(Packing.pack(tiny, 4))
    // (win_id, doc_id, start_tok, doc_off, n_toks); windows of 4:
    // doc0 fills w0[0..3); doc1 covers w0[3..4)+w1[0..3);
    // doc2 covers w1[3..4)+w2[0..1)
    val want = Set(
      Seq(0L, 0L, 0L, 0L, 3L), Seq(0L, 1L, 3L, 0L, 1L),
      Seq(1L, 1L, 0L, 1L, 3L), Seq(1L, 2L, 3L, 0L, 1L),
      Seq(2L, 2L, 0L, 1L, 1L))
    assert(got === want)
  }

  test("assembleWindows golden: window texts in stream order (L=4)") {
    val got = rowSet(Packing.assembleWindows(tiny, 4))
    assert(got === Set(
      Seq(0L, "a b c d", 4L), Seq(1L, "e f g h", 4L), Seq(2L, "i", 1L)))
  }

  test("assembleWindows == whole-stream chunking on real docs") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val wins = Packing.assembleWindows(docs, 64).collect()
      .map(r => r.getAs[Long]("win_id") -> r.getAs[String]("wtext"))
      .sortBy(_._1).map(_._2)
    // reference: concatenate every non-empty doc's tokens in doc_id
    // order on the driver, chunk by 64
    val stream = docs.select("doc_id", "text").collect()
      .sortBy(_.getAs[Long]("doc_id"))
      .flatMap(_.getAs[String]("text").split(" ").filter(_.nonEmpty))
    val want = stream.grouped(64).map(_.mkString(" ")).toArray
    assert(wins.toSeq === want.toSeq)
  }

  test("pack conserves tokens and never overfills a window") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val packed = Packing.pack(docs, 64).cache()
    try {
      val totIn = docs
        .select(sum(size(graft.ops.TextOps.tokens(col("text"))))).head().getLong(0)
      assert(packed.agg(sum("n_toks")).head().getLong(0) === totIn)
      val perWin = packed.groupBy("win_id").agg(sum("n_toks").as("fill")).collect()
      assert(perWin.forall(_.getAs[Long]("fill") <= 64))
      // every window except the last is exactly full
      val lastWin = perWin.map(_.getAs[Long]("win_id")).max
      assert(perWin.filter(_.getAs[Long]("win_id") < lastWin)
        .forall(_.getAs[Long]("fill") == 64L))
    } finally packed.unpersist()
  }

  test("scan == naive global window; invariant to nBuckets and partitioning") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val naive = rowSet(Packing.pack(docs, 64, nBuckets = 1))
    for (nb <- Seq(7, 256); parts <- Seq(1, 16))
      assert(rowSet(Packing.pack(docs.repartition(parts), 64, nBuckets = nb)) === naive,
        s"nBuckets=$nb parts=$parts diverges")
    assert(naive.nonEmpty)
  }

  test("tokenBudget golden: budget boundary keeps whole docs only") {
    val docs = Seq(
      ("s1", 0L, "a b c"), ("s1", 1L, "d e"), ("s1", 2L, "f"),
      ("s2", 3L, "g h i j k l")).toDF("source", "doc_id", "text")
    // s1 cums: 3, 5, 6; budget 5 keeps docs 0,1. s2 cum 6 > 5 → dropped.
    val got = rowSet(Packing.tokenBudget(docs, "source", 5L))
    assert(got === Set(Seq("s1", 0L, 3L, 3L), Seq("s1", 1L, 2L, 5L)))
  }

  test("tokenBudget: partition/bucket invariance on real docs") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val base = rowSet(Packing.tokenBudget(docs, "source", 700L, nBuckets = 1))
    assert(base.nonEmpty)
    assert(rowSet(Packing.tokenBudget(docs.repartition(16), "source", 700L,
      nBuckets = 64)) === base)
  }

  test("empty docs are dropped; empty input yields empty output") {
    val withEmpty = Seq((0L, "a b"), (1L, ""), (2L, " "), (3L, "c"))
      .toDF("doc_id", "text")
    // cum: doc0=2, doc3=3 → with L=2: doc0 fills w0, doc3 is w1[0..1)
    assert(rowSet(Packing.pack(withEmpty, 2)) ===
      Set(Seq(0L, 0L, 0L, 0L, 2L), Seq(1L, 3L, 0L, 0L, 1L)))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Packing.pack(empty, 4).count() === 0L)
    assert(Packing.tokenBudget(empty.withColumn("source", lit("s")),
      "source", 10L).count() === 0L)
  }

  test("sparse/negative ids: correctness independent of id distribution") {
    val docs = Seq((-1000000L, "a b"), (0L, "c"), (7L, "d e f"),
      (900000000L, "g")).toDF("doc_id", "text")
    // cum in id order: 2, 3, 6, 7; L=3 → doc(-1e6) w0[0..2), doc0 w0[2..3),
    // doc7 w1[0..3), doc9e8 w2[0..1)
    val want = Set(
      Seq(0L, -1000000L, 0L, 0L, 2L), Seq(0L, 0L, 2L, 0L, 1L),
      Seq(1L, 7L, 0L, 0L, 3L), Seq(2L, 900000000L, 0L, 0L, 1L))
    for (nb <- Seq(1, 5, 256))
      assert(rowSet(Packing.pack(docs, 3, nBuckets = nb)) === want, s"nb=$nb")
  }
}
