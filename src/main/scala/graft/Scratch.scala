package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.GeoTables
import graft.ops.{Gridding, RasterOps}

/** Throwaway fragment profiler for round-6 optimization (not a bench
  * surface; deleted or inert at round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val pts = GeoTables.points(spark, dir).select(col("x"), col("y"), col("value"))

    def run(tag: String, method: String): Unit = {
      def once(): Unit = RasterOps.cells(Gridding.delaunayGrid(
        pts, 0.25, 0.25, 0, 100, 400, 400, 50, 50, method = method))
        .write.format("noop").mode("overwrite").save()
      once()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH grid_$method ${ts.min}%.3f s")
    }
    run("linear", "linear")
    run("cubic", "cubic")
    run("cubic_ct", "cubic_ct")
    spark.stop()
  }
}
