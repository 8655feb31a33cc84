package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{GeoTables, RasterGen}

/** Throwaway fragment profiler for round-6 optimization (not a bench
  * surface; deleted or inert at round end). */
object Scratch {
  def time(tag: String)(df: => DataFrame): Unit = {
    val d = df
    d.write.format("noop").mode("overwrite").save() // warm
    val t0 = System.nanoTime()
    d.write.format("noop").mode("overwrite").save()
    println(f"SCRATCH $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("point_id")).orderBy(col("x"), col("y"), col("value"))
    val pts = GeoTables.points(spark, dir)
      .withColumn("pid", col("point_id") * 1024 + row_number().over(w))
      .select(col("pid").cast("long").as("pid"), col("x"), col("y"))

    time("pts+window")(pts)

    val ci = floor((lit(100.0) - col("y")) / 0.25).cast("int")
    val cj = floor((col("x") - 0.0) / 0.25).cast("int")
    val offs = (-1 to 1).toArray
    val neighbors = pts.select(col("pid"), ci.as("ci"), cj.as("cj"))
      .withColumn("di", explode(lit(offs)))
      .withColumn("dj", explode(lit(offs)))
      .select(col("pid"), (col("ci") + col("di")).as("si"), (col("cj") + col("dj")).as("sj"))
      .where(col("si") >= 0 && col("si") < 400 && col("sj") >= 0 && col("sj") < 400)
      .withColumn("tile_row", (col("si") / 50).cast("int"))
      .withColumn("tile_col", (col("sj") / 50).cast("int"))
    time("neighbors")(neighbors)

    val joined = neighbors.join(RasterGen.tiles(spark).toDF().select(
        col("tile_row"), col("tile_col"), col("data"), col("mask"), col("width")),
        Seq("tile_row", "tile_col"), "inner")
      .withColumn("k", (col("si") % 50).cast("int") * col("width") +
        (col("sj") % 50).cast("int"))
      .withColumn("v", graft.plans.CellValueExpr.cellValueNative(
        col("data"), col("mask"), col("k")))
      .select(col("pid"), col("v"))
    time("joined+v")(joined)

    val agg = joined.groupBy(col("pid"))
      .agg(count(col("v")).as("n_valid"), sum(col("v")).as("sum_val"))
      .where(col("n_valid") > 0)
    time("full reduce_points")(agg)

    spark.stop()
  }
}
