package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.geo.SplitMix64

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (embedding: array<float>).
  *
  * Baseline: brute-force cosine top-k — query side broadcast, corpus side
  * streamed; dot products in double via zip_with/aggregate (codegen, no
  * UDF). Scale path: signed-random-projection LSH buckets shrink the
  * candidate set; hyperplanes are SplitMix64-derived so results are
  * deterministic and partition-invariant.
  */
object Similarity {

  private def dotCols = expr(
    "aggregate(zip_with(q_emb, embedding, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), " +
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")

  private def normCol(c: String) = expr(
    s"sqrt(aggregate($c, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), deterministic tiebreak on id. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val pairs = corpus.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cosine", round(
        dotCols / (normCol("q_emb") * normCol("embedding")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    pairs.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cosine"), col("rk"))
  }

  /** Signed-random-projection bucket id: sign bits of `bits` hyperplane
    * dot products. Deterministic planes from SplitMix64(seed, plane, dim). */
  def srpBucket(emb: Array[Float], bits: Int, seed: Long): Int = {
    var bucket = 0
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var d = 0
      while (d < emb.length) {
        // standard-normal-ish plane component, deterministic per (p, d)
        dot += emb(d) * SplitMix64.gaussianPair(d.toLong, seed + p)._1
        d += 1
      }
      if (dot > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** LSH-bucketed ANN: candidates share any of `tables` SRP buckets, then
    * exact cosine on candidates only. Recall < 1 by design; the bench
    * compares against bruteTopK. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 8, tables: Int = 4): DataFrame = {
    val bucketUdf = udf((emb: Seq[Float], table: Int) =>
      srpBucket(emb.toArray, bits, 0x5eed0000L + table))
    val tableIds = (0 until tables).toArray

    def withBuckets(df: DataFrame, idCol: String, embCol: String) =
      df.select(col(idCol), col(embCol),
          explode(lit(tableIds)).as("tbl"))
        .withColumn("bucket", bucketUdf(col(embCol), col("tbl")))

    val c = withBuckets(corpus, "vec_id", "embedding")
    val q = withBuckets(
      queries.select(col("vec_id").as("qid"), col("embedding").as("q_emb")),
      "qid", "q_emb")

    val cand = c.join(q, Seq("tbl", "bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("q_emb"), col("embedding"))
      .distinct()
      .withColumn("cosine", round(
        dotCols / (normCol("q_emb") * normCol("embedding")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cosine"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold (dedup by
    * embedding): LSH buckets → exact cosine refine. */
  def cosineDupPairs(corpus: DataFrame, threshold: Double,
                     bits: Int = 8, tables: Int = 4): DataFrame = {
    val bucketUdf = udf((emb: Seq[Float], table: Int) =>
      srpBucket(emb.toArray, bits, 0x5eed0000L + table))
    val tableIds = (0 until tables).toArray
    val b = corpus.select(col("vec_id"), col("embedding"), explode(lit(tableIds)).as("tbl"))
      .withColumn("bucket", bucketUdf(col("embedding"), col("tbl")))
    val l = b.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
      col("tbl"), col("bucket"))
    val pairs = b.join(l, Seq("tbl", "bucket")).where(col("vec_id") < col("qid"))
      .select(col("qid"), col("vec_id"), col("q_emb"), col("embedding")).distinct()
      .withColumn("cosine", round(
        dotCols / (normCol("q_emb") * normCol("embedding")), 6))
    pairs.where(col("cosine") >= threshold)
      .select(col("vec_id").as("a_id"), col("qid").as("b_id"), col("cosine"))
  }
}
