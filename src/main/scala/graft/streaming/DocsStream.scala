package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

import graft.io.GeoTables
import graft.ops.SpatialJoin

/** Structured-Streaming ingest of the interleaved docs table (SURVEY.md
  * §2.11 — the reference has only chunked-batch incrementality; we expose
  * the same pipeline as an incremental stream).
  *
  * Shape: `readStream.parquet(docsDir)` → explode spans → PIP join against
  * a broadcast polygon side → per-batch zonal counts folded into a result
  * sink via foreachBatch (the `MultiprocConfig(outfile=...)` analog:
  * tiles/batches land as they complete). `Trigger.AvailableNow` drains the
  * backlog and stops — the resumable-batch mode a 10^12-doc backfill wants;
  * checkpointLocation gives exactly-once across restarts.
  */
object DocsStream {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("kind", StringType), StructField("text", StringType),
      StructField("media_ref", StringType), StructField("offset", IntegerType)))))))

  /** Stream docs parquet from `docsDir`, PIP-join points against `polys`
    * (small side, broadcast), write per-batch zonal partials to a DURABLE
    * batchId-keyed parquet sink under `sinkDir` and register the
    * roll-up view `sinkTable`.
    *
    * Exactly-once: foreachBatch is at-least-once on retry, so the sink is
    * idempotent per batch — each batch (over)writes its OWN partition
    * `batch_id=<id>` (dynamic partition overwrite); a retried or
    * restarted batch replaces, never double-counts, and completed batches
    * survive restarts on disk (unlike a driver-memory accumulator). */
  def runAvailableNow(spark: SparkSession, docsDir: String, polys: DataFrame,
                      checkpointDir: String, sinkTable: String,
                      sinkDir: String): Unit = {
    val docs = spark.readStream.schema(docsSchema).parquet(docsDir)
    val pts = docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.kind") === "point")
      .select(col("doc_id"),
        (split(col("s.text"), ",").getItem(0).cast("double") / 4.0).as("x"),
        (split(col("s.text"), ",").getItem(1).cast("double") / 4.0).as("y"),
        split(col("s.text"), ",").getItem(2).cast("double").as("value"))

    val q = pts.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val joined = SpatialJoin.pip(batch, polys, GeoTables.JoinLevel,
          broadcastPolys = true)
        joined.groupBy(col("zone_id"))
          .agg(count(lit(1)).as("n_pts"), sum(col("value")).as("sum_val"))
          .withColumn("batch_id", lit(batchId))
          .write
          .partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(sinkDir)
        ()
      }
      .start()
    q.awaitTermination()

    spark.read.parquet(sinkDir)
      .groupBy(col("zone_id"))
      .agg(sum(col("n_pts")).as("n_pts"), sum(col("sum_val")).as("sum_val"))
      .createOrReplaceTempView(sinkTable)
  }
}
