package graft

import org.apache.spark.sql.SparkSession

/** Extra measurement harness (guide §1.4): isolates single declared
  * queries with the SAME action as `Bench` (`.count()`), optionally a
  * noop sink, and dumps `.explain("formatted")` for plan-diff evidence.
  * Never replaces `Bench` — that file is the frozen driver contract.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra q_a q_b ..."       time listed queries
  *   PLAN_DIR=plans/r06 PLAN_TAG=before \
  *     sbt "runMain graft.BenchExtra q_a"             also write explain files
  *   BENCH_EXTRA_NOOP=1                               use noop sink not count
  *   BENCH_EXTRA_REPS=3                               reps per query (def 3)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val reps = sys.env.getOrElse("BENCH_EXTRA_REPS", "3").toInt
    val noop = sys.env.get("BENCH_EXTRA_NOOP").contains("1")
    val planDir = sys.env.get("PLAN_DIR")
    val planTag = sys.env.getOrElse("PLAN_TAG", "plan")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    for (q <- names) {
      val fn = SparkEntry.queries(q)
      spark.sparkContext.setJobDescription(q)
      planDir.foreach { dir =>
        new java.io.File(dir).mkdirs()
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/${q}_$planTag.txt"), txt)
      }
      if (sys.env.get("BENCH_EXTRA_PLAN_ONLY").contains("1")) {
        println(s"EXTRA $q plan-only")
      } else {
      def once(): Long =
        if (noop) { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); -1L }
        else fn(spark, sfDir).count()
      var n = once() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); n = once(); (System.nanoTime() - t0) / 1e9
      }
      println(f"EXTRA $q rows=$n best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
