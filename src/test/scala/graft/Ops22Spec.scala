package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Similarity, TextOps}

/** Semantic dedup manifest (SemDeDup-style) + the end-to-end curation
  * keep/drop manifest. */
class Ops22Spec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Float*) = xs.toArray

  test("semanticDedup: clusters, min-id roots, keep flags, partition invariance") {
    // 1,2,3 identical; 4 and 5 positively-scaled copies (cosine 1.0);
    // 6 orthogonal to everything
    val corpus = Seq(
      (1L, vec(1f, 0f, 0f, 0f)),
      (2L, vec(1f, 0f, 0f, 0f)),
      (3L, vec(1f, 0f, 0f, 0f)),
      (4L, vec(0f, 2f, 0f, 0f)),
      (5L, vec(0f, 5f, 0f, 0f)),
      (6L, vec(0f, 0f, 3f, 0f))
    ).toDF("vec_id", "embedding")
    val expect = Set(
      Seq[Any](1L, 1L, 1L), Seq[Any](2L, 1L, 0L), Seq[Any](3L, 1L, 0L),
      Seq[Any](4L, 4L, 1L), Seq[Any](5L, 4L, 0L), Seq[Any](6L, 6L, 1L))
    assert(rowSet(Similarity.semanticDedup(corpus, 0.95)) === expect)
    assert(rowSet(Similarity.semanticDedup(corpus.repartition(7), 0.95)) === expect)
  }

  test("semanticDedup: keep set is one representative per cluster on real embeddings") {
    val base = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // inject copies the way q_semantic_dedup does
    val corpus = base.unionByName(
      base.where(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding")))
    val m = Similarity.semanticDedup(corpus, 0.95).collect()
    assert(m.length === corpus.count())
    val byRoot = m.groupBy(_.getLong(1))
    byRoot.foreach { case (root, rows) =>
      // exactly one keeper per cluster, and it is the root itself
      assert(rows.count(_.getLong(2) == 1L) === 1)
      assert(rows.find(_.getLong(2) == 1L).get.getLong(0) === root)
      assert(rows.map(_.getLong(0)).min === root)
    }
    // every injected copy shares a cluster with its source
    m.filter(_.getLong(0) >= 10000L).foreach { r =>
      val src = r.getLong(0) - 10000L
      assert(byRoot(r.getLong(1)).exists(_.getLong(0) == src))
    }
  }

  test("keepManifest: first-failure cascade order, eval slice excluded") {
    val pass = (1 to 30).map(i => s"tok$i").mkString(" ") + " the of and in a to"
    val clean = (1 to 30).map(i => s"zig$i").mkString(" ") + " the of and in a to"
    val gram = (1 to 13).map(i => f"g$i%02d").mkString(" ")
    val docs = Seq(
      (1L, "a b"),           // keeper of the dup pair {1,3} -> quality
      (2L, s"$pass $gram"),  // passes quality, shares the eval 13-gram
      (3L, "a b"),           // exact_dup (beats its own too_short)
      (4L, clean),           // ok
      (5L, s"$pass $gram"),  // exact_dup of 2 (beats contaminated)
      (20L, gram),           // eval doc holding the gram — never emitted
      (40L, (1 to 20).map(i => s"ev$i").mkString(" ")) // eval doc — never emitted
    ).toDF("doc_id", "text")
    val got = Curation.keepManifest(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> (("quality:too_short", 0L)),
      2L -> (("contaminated", 0L)),
      3L -> (("exact_dup", 0L)),
      4L -> (("ok", 1L)),
      5L -> (("exact_dup", 0L))))
  }

  test("contaminatedIds: equals the distinct doc set of contamination's spans") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val train = docs.where(col("doc_id") % 20 =!= 0)
    val eval = docs.where(col("doc_id") % 20 === 0)
    val viaSpans = rowSet(
      TextOps.contamination(train, eval, 13).select(col("doc_id")).distinct())
    val direct = rowSet(TextOps.contaminatedIds(train, eval, 13))
    assert(direct === viaSpans)
    assert(direct.nonEmpty) // the sf0.001 corpus does contain overlaps
  }

  test("keepManifest: partition invariance on the real corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val a = rowSet(Curation.keepManifest(docs))
    val b = rowSet(Curation.keepManifest(docs.repartition(16)))
    assert(a === b)
    assert(a.nonEmpty)
  }
}
