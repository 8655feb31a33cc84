package graft

import org.apache.spark.sql.SparkSession
import graft.ops.BenchKernel

/** North-rule scaling evidence: run the BASELINE kernel at two
  * parallelism levels (local[8] vs local[32] — the sandbox stand-in for
  * N vs 4N executors) on identical input and report throughput at both
  * plus efficiency = (docs/sec @32) / (4 × docs/sec @8). Writes BENCH.md.
  *
  * Usage: runMain graft.Scaling [sfDir]
  */
object Scaling {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      // measured (ConfigProbe): partitions = cores with AQE on beats 2×/3×
      // waves for this kernel at both levels
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def measure(cores: Int, sfDir: String, reps: Int, replicas: Int): (Double, Long, Long) = {
    val spark = session(cores)
    val docs = BenchKernel.prepareInput(spark, sfDir, replicas).cache()
    val nDocs = docs.count()
    // two warm-ups: one leaves hot paths still in C2 compilation
    // (measured 2.4× penalty, see Bench.scala)
    BenchKernel.run(spark, docs)
    BenchKernel.run(spark, docs)
    var best = Double.MaxValue
    var rows = 0L
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      rows = BenchKernel.run(spark, docs)._1
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) best = dt
    }
    docs.unpersist()
    spark.stop()
    (nDocs / best, nDocs, rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = 4 // best-of-4: single-rep VM noise swings up to 3×
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val (tp8, nDocs, rows8) = measure(8, sfDir, reps, replicas)
    val (tp32, _, rows32) = measure(32, sfDir, reps, replicas)
    require(rows8 == rows32, s"kernel output differs across parallelism: $rows8 vs $rows32")
    val eff = tp32 / (4.0 * tp8)
    val json = f"""{"docs_per_sec_8":$tp8%.1f,"docs_per_sec_32":$tp32%.1f,""" +
      f""""scaling_efficiency":$eff%.3f,"n_docs":$nDocs,"kernel_rows":$rows8,""" +
      f""""replicas":$replicas,"sf":"$sfDir"}"""
    println(json)

    val md =
      s"""# BENCH — kernel throughput + scaling evidence
         |
         |Kernel (BASELINE.md definition): interleaved docs → explode spans →
         |cell cover → PIP spatial join → tile assignment → per-partition
         |row-count + cell-histogram metrics. Input preparation excluded from
         |timing; best of $reps timed reps after one warm-up rep; identical
         |input at both parallelism levels ($replicas deterministic corpus
         |replicas with distinct doc keys, so the job is long enough that
         |per-run stage-scheduling overhead doesn't dominate the 32-core
         |wall); output row counts asserted equal across levels.
         |
         || config | docs/sec | n_docs | kernel output rows |
         || --- | --- | --- | --- |
         || local[8], shuffle.partitions=8 | ${f"$tp8%.1f"} | $nDocs | $rows8 |
         || local[32], shuffle.partitions=32 | ${f"$tp32%.1f"} | $nDocs | $rows32 |
         |
         |**Scaling efficiency (8 → 32 cores, the sandbox N → 4N stand-in):
         |${f"$eff%.3f"}** (target ≥ 0.8 per BASELINE.json north rule).
         |
         |Input: `$sfDir` (seed-42 driver tables; docs assembled
         |deterministically by `graft.io.GeoTables.docs`).
         |Reproduce: `sbt -batch "runMain graft.Scaling $sfDir"`.
         |""".stripMargin
    // BENCH.md is the hand-curated evidence document (run series +
    // analysis); raw per-run output goes to its own file so a re-run
    // can't clobber the curation — fold new runs into BENCH.md by hand.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SCALING_LAST_RUN.md"), md)
  }
}
