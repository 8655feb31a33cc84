package graft

import org.apache.spark.sql.functions._
import graft.io.RasterGen
import graft.ops.Polygonize

class Ops7Spec extends SparkSpec {

  test("polygonize with a range target: one class, cells match the selection mask") {
    val out = Polygonize.polygonize(RasterGen.tiles(spark), conn = 4,
      target = Some((40.0, 50.0))).collect()
    assert(out.forall(_.getAs[Double]("raster_value") == 1.0))
    val total = out.map(_.getAs[Long]("n_cells")).sum
    var exp = 0L
    for (i <- 0 until 400; j <- 0 until 400
         if RasterGen.valid(i, j) && RasterGen.value(i, j) >= 40 && RasterGen.value(i, j) <= 50)
      exp += 1
    assert(total == exp)
    // range selection merges adjacent values into shared components:
    // strictly fewer or equal components than the per-value union
    val perValue = Polygonize.polygonize(RasterGen.tiles(spark), conn = 4).collect()
      .count(r => r.getAs[Double]("raster_value") >= 40 && r.getAs[Double]("raster_value") <= 50)
    assert(out.length <= perValue)
  }

  test("streaming events with watermark + tumbling window equals the batch result") {
    val tmp = java.nio.file.Files.createTempDirectory("ev-stream")
    val evDir = s"$tmp/events"; val ck = s"$tmp/ck"
    spark.read.parquet(s"$sf001/events.parquet").write.parquet(evDir)

    val schema = spark.read.parquet(evDir).schema
    val stream = spark.readStream.schema(schema).parquet(evDir)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ → event-time type
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("sum_val"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_val"))

    val q = stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .outputMode("append")
      .format("memory").queryName("ev_windows")
      .start()
    q.awaitTermination()

    val batch = spark.read.parquet(evDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("sum_val"))
    // append mode with watermark only emits CLOSED windows: every emitted
    // row must match batch, and all but the final watermark-held windows
    // are emitted
    val got = rowSet(spark.table("ev_windows"))
    val exp = rowSet(batch)
    assert(got.subsetOf(exp), "streamed windows must agree with batch")
    assert(got.size >= exp.size - 5, s"only tail windows may be held back: ${got.size}/${exp.size}")
  }
}
