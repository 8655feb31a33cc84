package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact dedup at ingest (training-data pipeline op): drop
  * duplicate records as they arrive, with BOUNDED state.
  *
  * `dropDuplicates` on a stream keeps one state entry per key EVER seen —
  * unbounded on a 10^12-doc backfill. `dropDuplicatesWithinWatermark`
  * (Spark 3.5+) evicts a key's entry once the event-time watermark passes
  * its first-seen timestamp + delay, so state is proportional to the
  * key-arrival rate × window, not to history. Contract: duplicates of a
  * key arrive within `delay` of its first occurrence — exactly the ingest
  * shape (replayed uploads, retried extract batches, at-least-once
  * sources); a re-occurrence after the window is treated as a new record
  * (by design — it IS new data to an incremental consumer).
  *
  * First occurrence wins: the emitted row is the first-processed one, so
  * downstream sees stable attributes for a key even when later duplicates
  * differ in payload.
  *
  * MULTI-BATCH ORDERING NOTE (empirically pinned by an Ops12 spec on
  * Spark 4.1.2): a throttled drain (`maxFilesPerTrigger` set) processes
  * files in MODIFICATION-TIME order, so a backfill file carrying event
  * times older than the already-advanced watermark can arrive late.
  * Unlike other stateful operators, `dropDuplicatesWithinWatermark` does
  * NOT silently drop such rows — they are still emitted (no data loss on
  * out-of-event-time-order backfills). The residual caveat is weaker:
  * a late row's dedup state expires immediately (first-seen + delay is
  * already behind the watermark), so duplicates of it in LATER batches
  * re-emit — size `delay` to cover the worst file-order inversion if
  * exact cross-batch dedup of late backfills matters.
  */
object DedupStream {

  /** Drain `eventsDir` with AvailableNow, dedup on `keys` within `delay`
    * of each key's first occurrence, append surviving rows to a durable
    * parquet sink. Re-invoking with the same `checkpointDir` resumes
    * exactly-once: already-emitted rows are not re-appended, and the
    * dedup state (including watermark) carries across restarts. */
  def dedupAvailableNow(spark: SparkSession, eventsDir: String,
                        keys: Seq[String], delay: String,
                        checkpointDir: String, sinkDir: String,
                        maxFilesPerTrigger: Option[Int] = None): Unit = {
    val schema = spark.read.parquet(eventsDir).schema
    val reader = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(eventsDir)
    val deduped = src
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys)
    val q = deduped.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet").option("path", sinkDir)
      .start()
    q.awaitTermination()
  }
}
