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

  test("stateful streaming sessionize (flatMapGroupsWithState) == batch, exactly-once across restart") {
    import graft.streaming.Sessionize
    val tmp = java.nio.file.Files.createTempDirectory("sess-stream")
    val evDir = s"$tmp/events"; val ck = s"$tmp/ck"; val sink = s"$tmp/sink"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(evDir))

    // slice events into 3 time-ordered files (sessions cross slice
    // boundaries → state carry-over is exercised); explicit modTimes pin
    // the FileStreamSource processing order
    val ev = spark.read.parquet(s"$sf001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val tsSorted = ev.select(unix_timestamp(col("ts"))).collect().map(_.getLong(0)).sorted
    val t1 = tsSorted(tsSorted.length / 3); val t2 = tsSorted(2 * tsSorted.length / 3)
    def slice(name: String, df: org.apache.spark.sql.DataFrame, modSec: Long): Unit = {
      val d = java.nio.file.Files.createTempDirectory("sess-slice").toString
      df.coalesce(1).write.mode("overwrite").parquet(d)
      val part = new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(evDir, name)
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(modSec * 1000))
    }
    slice("a.parquet", ev.where(unix_timestamp(col("ts")) < t1), 1000000)
    slice("b.parquet", ev.where(unix_timestamp(col("ts")).between(t1, t2 - 1)), 1000060)

    // phase 1: drain slices a+b (one file per micro-batch), then STOP —
    // the restart must not re-emit already-closed sessions
    Sessionize.runAvailableNow(spark, evDir, ck, sink, maxFilesPerTrigger = Some(1))
    val phase1 = spark.read.parquet(sink).count()

    // phase 2: add the tail slice + a far-future sentinel event that
    // pushes the watermark past every open session's deadline, resume
    val maxTs = tsSorted.last
    slice("c.parquet", ev.where(unix_timestamp(col("ts")) >= t2), 1000120)
    slice("d_sentinel.parquet",
      ev.limit(1).select(lit(-1L).as("event_id"),
        timestamp_seconds(lit(maxTs + 7200)).as("ts"), lit(-1L).as("user_id"),
        lit("sentinel").as("event_type"), lit(0.0).as("value"), lit("").as("props")),
      1000180)
    Sessionize.runAvailableNow(spark, evDir, ck, sink, maxFilesPerTrigger = Some(1))

    val got = rowSet(spark.read.parquet(sink).where(col("user_id") >= 0)
      .select(col("user_id"), col("session_id").cast("long").as("session_id"),
        col("n_events"), round(col("sum_val"), 2).as("sum_val")))

    // batch truth: the q_sessionize window-lag plan over a+b+c
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batchSess = ev
      .withColumn("gap", unix_timestamp(col("ts")) -
        unix_timestamp(lag(col("ts"), 1).over(w)))
      .withColumn("new_sess", when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_val"))
    val exp = rowSet(batchSess.select(col("user_id"), col("session_id").cast("long"),
      col("n_events"), round(col("sum_val"), 2).as("sum_val")))

    assert(phase1 > 0, "some sessions must close during phase 1")
    assert(phase1 < exp.size, "phase 1 must not have emitted everything (resume is real)")
    assert(got == exp, s"streaming sessions != batch (${got.size} vs ${exp.size})")
  }

  test("sessionize cross-batch late-beyond-watermark event: deterministic drop, counted") {
    import graft.streaming.Sessionize
    val tmp = java.nio.file.Files.createTempDirectory("sess-late")
    val evDir = s"$tmp/events"; val ck = s"$tmp/ck"; val sink = s"$tmp/sink"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(evDir))

    def file(name: String, rows: Seq[(Long, Long, Long, Double)], modSec: Long): Unit = {
      import spark.implicits._
      val d = java.nio.file.Files.createTempDirectory("sess-late-slice").toString
      rows.toDF("event_id", "tsSec", "user_id", "value")
        .select(col("event_id"), timestamp_seconds(col("tsSec")).as("ts"),
          col("user_id"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(d)
      val part = new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(evDir, name)
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(modSec * 1000))
    }

    // batch 1: user 42's open session (t=1000, 2000) + a t=100000 event
    // on user 99 that drives the watermark to 99999s
    file("a.parquet", Seq((1L, 1000L, 42L, 1.0), (2L, 2000L, 42L, 2.0),
      (3L, 100000L, 99L, 0.0)), 1000000)
    // batch 2: a CONTRACT-VIOLATING event for user 42 (t=2500 is inside
    // the old session's gap but far below the watermark) + a sentinel
    // that pushes the watermark past every deadline
    file("b.parquet", Seq((4L, 2500L, 42L, 4.0),
      (5L, 200000L, 99L, 0.0)), 1000060)

    val acc = spark.sparkContext.longAccumulator("lateDroppedStream")
    Sessionize.runAvailableNow(spark, evDir, ck, sink,
      maxFilesPerTrigger = Some(1), lateDropped = Some(acc))

    // the late event must be DISCARDED (not folded into the session, not
    // a spurious new session) and counted exactly once
    val got = rowSet(spark.read.parquet(sink).where(col("user_id") === 42L)
      .select(col("user_id"), col("session_id").cast("long"),
        col("n_events"), round(col("sum_val"), 2).as("sum_val")))
    assert(got == Set(Seq[Any](42L, 1L, 2L, 3.0)),
      s"user 42 must close exactly one 2-event session, got $got")
    assert(acc.value == 1L, s"exactly the one late event is counted, got ${acc.value}")
  }
}
