package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints

/** Throwaway fragment profiler for round-6 optimization (not a bench
  * surface; deleted or inert at round end). */
object Scratch {

  /** round-5 jaccardJoin (full-corpus sets) for A/B. */
  def jaccardOld(docs: DataFrame, k: Int, threshold: Double): DataFrame = {
    val grams = Checkpoints.ephemeral(docs
      .select(col("doc_id"), expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
      .select(col("doc_id"), explode(expr(
        s"CASE WHEN size(ts) >= $k THEN array_distinct(transform(" +
        s"sequence(1, size(ts) - ${k - 1}), i -> " +
        s"CAST(conv(substring(md5(concat_ws(' ', slice(ts, i, $k))), 1, 15), 16, 10) AS BIGINT)" +
        s")) ELSE array() END")).as("h")))
    val ceilTs: Column => Column = s => ceil(lit(threshold) * s - lit(1e-9))
    val dfreq = grams.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefix = grams.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ord"),
           count(lit(1)).as("s"))
      .withColumn("p", (col("s") - ceilTs(col("s")) + 1).cast("int"))
      .select(col("doc_id"), col("s"),
        explode(expr("transform(slice(ord, 1, p), x -> x.h)")).as("h"))
    val cands = prefix.toDF("a_id", "sa", "h")
      .join(prefix.toDF("b_id", "sb", "h"), Seq("h"))
      .where(col("a_id") < col("b_id") &&
             col("sb") >= ceilTs(col("sa")) && col("sa") >= ceilTs(col("sb")))
      .select(col("a_id"), col("b_id")).distinct()
    val sets = grams.groupBy(col("doc_id")).agg(collect_set(col("h")).as("hs"))
    cands
      .join(sets.toDF("a_id", "a_hs"), "a_id")
      .join(sets.toDF("b_id", "b_hs"), "b_id")
      .withColumn("o", size(array_intersect(col("a_hs"), col("b_hs"))))
      .withColumn("jaccard", col("o").cast("double") /
        (size(col("a_hs")) + size(col("b_hs")) - col("o")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def t(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    jaccardOld(docs, 3, 0.5).count(); graft.ops.TextOps.jaccardJoin(docs, 3, 0.5).count()
    val reps = (1 to 3).map { _ =>
      (t(jaccardOld(docs, 3, 0.5).count()), t(graft.ops.TextOps.jaccardJoin(docs, 3, 0.5).count()))
    }
    println(f"SCRATCH jaccard old=${reps.map(_._1).min}%.3f new=${reps.map(_._2).min}%.3f " +
      reps.map(r => f"(${r._1}%.2f,${r._2}%.2f)").mkString(" "))
    spark.stop()
  }
}
