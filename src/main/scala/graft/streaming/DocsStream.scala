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
    * (small side, broadcast), fold zonal counts into an in-memory-table
    * accumulator named `sinkTable`. Returns after the backlog drains. */
  def runAvailableNow(spark: SparkSession, docsDir: String, polys: DataFrame,
                      checkpointDir: String, sinkTable: String): Unit = {
    val docs = spark.readStream.schema(docsSchema).parquet(docsDir)
    val pts = docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.kind") === "point")
      .select(col("doc_id"),
        (split(col("s.text"), ",").getItem(0).cast("double") / 4.0).as("x"),
        (split(col("s.text"), ",").getItem(1).cast("double") / 4.0).as("y"),
        split(col("s.text"), ",").getItem(2).cast("double").as("value"))

    val acc = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Double)]()

    val q = pts.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val joined = SpatialJoin.pip(batch, polys, GeoTables.JoinLevel,
          broadcastPolys = true)
        joined.groupBy(col("zone_id"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
          .collect().foreach { r =>
            acc.merge(r.getLong(0), (r.getLong(1), r.getDouble(2)),
              (a, b) => (a._1 + b._1, a._2 + b._2))
          }
        ()
      }
      .start()
    q.awaitTermination()

    import scala.jdk.CollectionConverters._
    import spark.implicits._
    acc.asScala.toSeq.map { case (z, (n, s)) => (z, n, s) }
      .toDF("zone_id", "n_pts", "sum_val")
      .createOrReplaceTempView(sinkTable)
  }
}
