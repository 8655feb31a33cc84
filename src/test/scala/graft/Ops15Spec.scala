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

  test("stratifiedTopK == naive single-window top-k, every nSalts") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = (0 until 500)
      .map(d => (d.toLong, Seq("en", "es", "de", "fr", "zh")(d % 5)))
      .toDF("doc_id", "lang")
    val naive = docs
      .withColumn("skey", (col("doc_id") * lit(2654435761L)) % lit(1000000007L))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("skey"), col("doc_id"))))
      .where(col("rk") <= 20)
      .select(col("lang"), col("doc_id"), col("skey"), col("rk"))
      .collect().map(_.toString).sorted.toSeq
    for (nSalts <- Seq(1, 7, 32)) {
      val got = graft.ops.Sampling.stratifiedTopK(docs, "lang", "doc_id", 20, nSalts)
        .collect().map(_.toString).sorted.toSeq
      assert(got == naive, s"nSalts=$nSalts diverges from the naive window")
    }
    // quota property: min(k, group size) rows per group
    val small = docs.where(col("doc_id") < 7) // groups of size 2/2/1/1/1
    val counts = graft.ops.Sampling.stratifiedTopK(small, "lang", "doc_id", 2)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 2, "es" -> 2, "de" -> 1, "fr" -> 1, "zh" -> 1))
  }

  test("stratifiedTopK is partition-invariant (1 vs 16)") {
    val docs = (0 until 300)
      .map(d => (d.toLong, if (d % 3 == 0) "en" else "es"))
      .toDF("doc_id", "lang")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(graft.ops.Sampling.stratifiedTopK(docs.repartition(1), "lang", "doc_id", 15)) ==
      canon(graft.ops.Sampling.stratifiedTopK(docs.repartition(16), "lang", "doc_id", 15)))
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
