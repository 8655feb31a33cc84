package graft

import org.apache.spark.sql.SparkSession
import graft.ops.BenchKernel

/** Diagnostic: run the BASELINE kernel once at a given core count with the
  * Spark event log on, so stage-level times/task counts can be parsed —
  * used to verify the kernel has no partition-count or serial-stage
  * bottleneck that would cap N→4N scaling (BENCH.md evidence).
  *
  * Usage: runMain graft.KernelProfile <cores> [sfDir] [replicas] [reps] [partitions] [level]
  */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(3)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val parts = args.lift(4).map(_.toInt).getOrElse(cores)
    val level = args.lift(5).map(_.toInt).getOrElse(graft.io.GeoTables.JoinLevel)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("/tmp/sparklogs"))
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-kernel-profile-$cores")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/sparklogs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = BenchKernel.prepareInput(spark, sfDir, replicas).cache()
    val n = docs.count()
    BenchKernel.run(spark, docs, level); BenchKernel.run(spark, docs, level) // C2 warm
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      BenchKernel.run(spark, docs, level)
      System.err.println(f"rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(${n / ((System.nanoTime() - t0) / 1e9)}%.0f docs/s)")
    }
    spark.stop()
  }
}
