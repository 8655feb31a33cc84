package graft

import org.apache.spark.sql.functions._
import graft.ops.Curation

/** Curation operators: PII scrub goldens, quality-gate rule cascade,
  * mixing-weight invariants, split-assignment conservation/determinism,
  * BM25 hand-computed scores, and bigram vocabulary goldens.
  */
class Ops17Spec extends SparkSpec {

  import spark.implicits._

  test("piiScrub golden: counts and redaction witness") {
    val docs = Seq(
      (0L, "mail me at a.b+c@x-corp.io or jo@y.org thanks"),
      (1L, "call +1-555-0042 from 10.0.3.21 now"),
      (2L, "no pii here at all"),
      (3L, "version 1.2 costs 3.4 dollars")).toDF("doc_id", "text")
    val got = Curation.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toMap
    assert(got(0L)._1 === 2 && got(0L)._2 === 0 && got(0L)._3 === 0)
    assert(got(1L) === ((0, 1, 1,
      md5hex("call <PHONE> from <IP> now"))))
    assert(got(2L) === ((0, 0, 0, md5hex("no pii here at all"))))
    // "1.2" / "3.4" are not 4-octet runs: the IPv4 pattern must not fire
    assert(got(3L) === ((0, 0, 0, md5hex("version 1.2 costs 3.4 dollars"))))
    assert(got(0L)._4 ===
      md5hex("mail me at <EMAIL> or <EMAIL> thanks"))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("qualityFilter: each rule fires, in cascade order") {
    val long25 = (1 to 30).map(i => s"tok$i").mkString(" ") // no stopword
    val docs = Seq(
      (0L, "a b"), // too_short
      (1L, long25), // no_stopword (30 distinct tokens, none in list)
      (2L, ("the " + (1 to 30).map(i => s"verylongtoken$i").mkString(" "))), // word_len
      // 27 tokens, 3 distinct (ratio 0.11), avg len 107/27≈3.96 in range
      (3L, "the " + Seq.fill(13)("aaaa bbbb").mkString(" ")), // low_diversity
      // 28 tokens, 24 distinct, avg len 121/28≈4.32, 'the'×4/28≈0.143>0.12
      (4L, "the quick brown fox " +
        (1 to 21).map(i => s"tok$i").mkString(" ") + " the the the")
    ).toDF("doc_id", "text")
    val got = Curation.qualityFilter(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got(0L) === (("too_short", 0L)))
    assert(got(1L) === (("no_stopword", 0L)))
    assert(got(2L) === (("word_len", 0L)))
    assert(got(3L) === (("low_diversity", 0L)))
    assert(got(4L) === (("max_tok_ratio", 0L)))
  }

  test("qualityFilter: a passing doc and the empty-doc guard") {
    val ok = (1 to 30).map(i => s"tok$i").mkString(" ") + " the of and in a to"
    val docs = Seq((0L, ok), (1L, "")).toDF("doc_id", "text")
    val got = Curation.qualityFilter(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got(0L) === (("ok", 1L)))
    assert(got(1L) === (("too_short", 0L)))
  }

  test("mixWeights: weights sum to 1; alpha=1 is proportional") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val w = Curation.mixWeights(docs).collect()
    assert(math.abs(w.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    val w1 = Curation.mixWeights(docs, alpha = 1.0).collect()
    val tot = w1.map(_.getLong(2)).sum.toDouble
    w1.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2) / tot) < 1e-6)
    }
    // alpha=1: every source runs the same number of epochs (budget/total)
    val eps = w1.map(_.getDouble(4)).distinct
    assert(eps.length === 1)
  }

  test("splitAssign: conserves docs/tokens and is repartition-invariant") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val sp = Curation.splitAssign(docs).collect()
    assert(sp.map(_.getLong(2)).sum === docs.count())
    val nTok = docs.select(sum(size(graft.ops.TextOps.tokens(col("text")))))
      .head.getLong(0)
    assert(sp.map(_.getLong(3)).sum === nTok)
    assert(rowSet(Curation.splitAssign(docs.repartition(13))) === rowSet(
      Curation.splitAssign(docs)))
    val splits = sp.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
  }

  test("bm25 golden: hand-computed score on a 4-doc corpus") {
    val docs = Seq(
      (0L, "spark spark join x"), (1L, "join y z"),
      (2L, "a b c d"), (3L, "w w w w")).toDF("doc_id", "text")
    val got = Curation.bm25(docs, Seq("spark", "join"), topK = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=4, avgdl=3.75; df_spark=1, df_join=2
    val idfS = math.log(1 + (4 - 1 + 0.5) / 1.5)
    val idfJ = math.log(1 + (4 - 2 + 0.5) / 2.5)
    def s(tf: Double, nd: Double, idf: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * nd / 3.75))
    assert(math.abs(got(0L) - (s(2, 4, idfS) + s(1, 4, idfJ))) < 1e-6)
    assert(math.abs(got(1L) - s(1, 3, idfJ)) < 1e-6)
    assert(!got.contains(2L) && !got.contains(3L))
  }

  test("bm25: topK cutoff is deterministic under repartitioning") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val a = Curation.bm25(docs, Seq("spark", "join", "window")).collect().toSeq
    val b = Curation.bm25(docs.repartition(7), Seq("spark", "join", "window"))
      .collect().toSeq
    assert(a.map(_.toSeq) === b.map(_.toSeq))
    assert(a.length === 20)
  }

  test("vocabBigrams golden: counts, tiebreak, single-token docs") {
    val docs = Seq(
      (0L, "x y x y"), (1L, "x y"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = Curation.vocabBigrams(docs, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // "x y" ×3 (two in doc0, one in doc1), "y x" ×1; ties/gaps: none else
    assert(got === Seq(("x y", 3L), ("y x", 1L)))
  }
}
