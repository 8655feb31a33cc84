package graft

import graft.ops.TextOps

/** Round-5 specs: corpus-unigram NLL quality scoring (the CCNet-style
  * perplexity filter with the corpus as the LM) and per-doc top-k TF-IDF.
  * Hand-computed goldens on a 2-doc corpus, the rare-vs-common ordering
  * property, deterministic tie handling, and 1-vs-16-partition invariance.
  */
class Ops15Spec extends SparkSpec {

  import spark.implicits._

  private val tiny = Seq((0L, "a b a"), (1L, "b c")).toDF("doc_id", "text")

  test("unigramNll golden: 2-doc corpus, closed-form ln values") {
    // counts: a=2, b=2, c=1, total=5
    // doc0 (a b a): avg_nll = ln5 − (2·ln2 + ln2)/3 = ln5 − ln2
    // doc1 (b c):   avg_nll = ln5 − (ln2 + ln1)/2   = ln5 − ln2/2
    val got = TextOps.unigramNll(tiny).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0L)._1 == 3 && got(1L)._1 == 2)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0L)._2 == r6(math.log(5) - math.log(2)))
    assert(got(1L)._2 == r6(math.log(5) - math.log(2) / 2))
  }

  test("unigramNll orders rare-token docs above boilerplate") {
    val docs = (0 until 20).map(d => (d.toLong, "common words common words"))
      .:+((99L, "zxqv kjwp mmtr"))
      .toDF("doc_id", "text")
    val nll = TextOps.unigramNll(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(99L) > nll(0L),
      s"rare-token doc must score higher: ${nll(99L)} vs ${nll(0L)}")
    // all boilerplate docs identical score
    assert((0 until 20).map(d => nll(d.toLong)).distinct.size == 1)
  }

  test("tfidfTopK golden: smooth idf, rounded-score ranking") {
    // N=2; df: a=1, b=2, c=1; idf(a)=idf(c)=ln(3/2)+1, idf(b)=ln(3/3)+1=1
    // doc0: a: 2/3·(ln1.5+1)=0.936977  b: 1/3
    // doc1: c: 1/2·(ln1.5+1)=0.702733  b: 1/2
    val got = TextOps.tfidfTopK(tiny, 2).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got((0L, 1)) == ("a", 0.936977))
    assert(got((0L, 2)) == ("b", 0.333333))
    assert(got((1L, 1)) == ("c", 0.702733))
    assert(got((1L, 2)) == ("b", 0.5))
  }

  test("tfidfTopK ties break on term asc after 6-dp rounding") {
    // both terms appear once in the doc and once in the corpus: identical
    // (tf, df) ⇒ identical score ⇒ rank must follow term order
    val docs = Seq((0L, "beta alpha")).toDF("doc_id", "text")
    val got = TextOps.tfidfTopK(docs, 2).collect()
      .map(r => r.getInt(3) -> r.getString(1)).toMap
    assert(got(1) == "alpha" && got(2) == "beta")
  }

  test("unigramNll and tfidfTopK are partition-invariant (1 vs 16)") {
    val docs = (0 until 120).map { d =>
      val toks = (0 until 12).map(i => s"w${(d * 7 + i * 3) % 23}")
      (d.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(TextOps.unigramNll(docs.repartition(1))) ==
      canon(TextOps.unigramNll(docs.repartition(16))))
    assert(canon(TextOps.tfidfTopK(docs.repartition(1), 3)) ==
      canon(TextOps.tfidfTopK(docs.repartition(16), 3)))
  }
}
