package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{BenchKernel, SpatialJoin}
import graft.io.GeoTables

/** Scratch profiler for kernel scaling work — not part of the contract. */
object ConfigProbe {

  class Agg extends org.apache.spark.scheduler.SparkListener {
    @volatile var run = 0L; @volatile var gc = 0L; @volatile var cpu = 0L
    @volatile var tasks = 0L
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        run += m.executorRunTime; gc += m.jvmGCTime
        cpu += m.executorCpuTime / 1000000L; tasks += 1
        stages.merge(e.stageId, (1L, m.executorRunTime),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    }
    def reset(): Unit = { run = 0; gc = 0; cpu = 0; tasks = 0; stages.clear() }
    def stageReport: String = {
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).map { case (s, (n, t)) =>
        f"s$s:n=$n,t=${t / 1e3}%.1f" }.mkString(" ")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (cores <- Seq(8, 32)) {
      for ((mult, aqe) <- Seq((1, true))) {
        val spark = SparkSession.builder()
          .master(s"local[$cores]")
          .appName(s"probe-$cores-$mult-$aqe")
          .config("spark.sql.shuffle.partitions", (cores * mult).toString)
          .config("spark.sql.adaptive.enabled", aqe.toString)
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        val agg = new Agg
        spark.sparkContext.addSparkListener(agg)
        val docs = BenchKernel.prepareInput(spark, sfDir).cache()
        docs.count()

        def time(tag: String)(f: => Long): Unit = {
          f // warm
          val ts = (1 to 3).map { _ =>
            agg.reset()
            val t0 = System.nanoTime(); f
            val wall = (System.nanoTime() - t0) / 1e9
            (wall, agg.run / 1e3, agg.gc / 1e3, agg.cpu / 1e3, agg.tasks)
          }
          val b = ts.minBy(_._1)
          println(f"PROBE cores=$cores mult=$mult aqe=$aqe $tag%-8s wall=${b._1}%.2f " +
            f"taskRun=${b._2}%.1f cpu=${b._4}%.1f gc=${b._3}%.1f tasks=${b._5} " +
            f"par=${b._2 / b._1}%.1f")
          println(s"STAGES cores=$cores $tag ${agg.stageReport}")
        }

        val spans = docs.select(col("doc_id"), explode(col("spans")).as("s"))
        val polys = spans.where(col("s.kind") === "wkt")
          .select(col("doc_id").as("poly_doc"), col("s.text").as("wkt"))
        val pts = spans.where(col("s.kind") === "point")
          .select(col("doc_id"),
            (split(col("s.text"), ",").getItem(0).cast("double") / 4.0).as("x"),
            (split(col("s.text"), ",").getItem(1).cast("double") / 4.0).as("y"),
            split(col("s.text"), ",").getItem(2).cast("double").as("value"))

        time("kernel")(BenchKernel.run(spark, docs)._1)
        docs.unpersist()
        spark.stop()
      }
    }
  }
}
