package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.GeoTables
import graft.ops.{Checkpoints, Overlay, SpatialJoin}

/** Throwaway fragment profiler for round-6 optimization (not a bench
  * surface; deleted or inert at round end). */
object Scratch {
  def time(tag: String)(f: => Unit): Unit = {
    f // warm
    val t0 = System.nanoTime()
    f
    println(f"SCRATCH $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }
  def timeDf(tag: String)(df: => DataFrame): Unit =
    time(tag)(df.write.format("noop").mode("overwrite").save())

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val z = GeoTables.zones(spark, dir)
    val a = z.where(col("zone_id") % 10 === 1)
      .select(col("zone_id").as("id_a"), col("wkt").as("wkt_a"))
    val b = z.where(col("zone_id") % 10 === 3)
      .select(col("zone_id").as("id_b"), col("wkt").as("wkt_b"))

    timeDf("sjoin_pairs")(
      SpatialJoin.sjoin(a, b, "intersects", 7, emitEnv = true))
    timeDf("sjoin_annotated")(
      SpatialJoin.sjoin(a, b, "intersects", 7, emitEnv = true)
        .join(a, Seq("id_a")).join(b, Seq("id_b")))
    time("checkpoint")(
      Checkpoints.materialize(
        SpatialJoin.sjoin(a, b, "intersects", 7, emitEnv = true)
          .join(a, Seq("id_a")).join(b, Seq("id_b"))
          .withColumn("both_rect", col("rect_a") && col("rect_b"))))
    time("full_overlay_union") {
      Overlay.overlay(a, b, "union", areaOnly = true)
        .select(col("id_a"), col("id_b"), col("area")).count()
    }

    // sjoin_boxes shape
    timeDf("sjoin_boxes_full")(
      SpatialJoin.sjoin(
        z.select(col("zone_id").as("id_a"), col("wkt").as("wkt_a")),
        z.select(col("zone_id").as("id_b"), col("wkt").as("wkt_b")),
        "intersects", level = 5)
        .where(col("id_a") < col("id_b")))

    spark.stop()
  }
}
