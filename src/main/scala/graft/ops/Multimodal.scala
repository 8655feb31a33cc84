package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{RasterTile, TileCodec}

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, processed batch-wise in mapPartitions
  * (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE decoder: it parses our tile blob
  * header and emits shape/checksum features. The Spark-side plumbing —
  * schema, batching, partition flow — is real and tested; swap
  * `fakeDecode` for a real codec (JNI/ONNX) in production.
  */
object Multimodal {

  final case class MediaMeta(media_ref: String, n_bytes: Long,
                             width: Int, height: Int, checksum: Long)

  /** Resolve "tile://<id>/<band>/<r>/<c>" refs against the tile table and
    * attach the payload as a binary column — the media-fetch join. */
  def resolveMedia(refs: DataFrame, tiles: Dataset[RasterTile]): DataFrame = {
    val parts = split(col("media_ref"), "/")
    refs
      .withColumn("tile_row", element_at(parts, -2).cast("int"))
      .withColumn("tile_col", element_at(parts, -1).cast("int"))
      .join(tiles.toDF().select(col("tile_row"), col("tile_col"),
          col("width"), col("height"), col("data")),
        Seq("tile_row", "tile_col"), "left")
  }

  /** STUB decode (deterministic fake): real deployments replace the body
    * with an actual image/audio decoder; everything around it (binary in,
    * struct of features out, per-partition batching) is the real shape. */
  private def fakeDecode(payload: Array[Byte]): (Long, Long) = {
    if (payload == null) (0L, 0L)
    else {
      var checksum = 1469598103934665603L
      var i = 0
      while (i < payload.length) {
        checksum = (checksum ^ payload(i)) * 1099511628211L
        i += 1
      }
      (payload.length.toLong, checksum)
    }
  }

  /** Batch feature extraction over resolved media (mapPartitions — one
    * decoder instance per partition, rows streamed through it). */
  def extractFeatures(resolved: DataFrame): DataFrame = {
    val spark = resolved.sparkSession
    import spark.implicits._
    resolved.select(col("media_ref"), col("width"), col("height"), col("data"))
      .as[(String, java.lang.Integer, java.lang.Integer, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec handle, model…)
        it.map { case (ref, w, h, payload) =>
          val (n, sum) = fakeDecode(payload)
          MediaMeta(ref, n, if (w == null) -1 else w, if (h == null) -1 else h, sum)
        }
      }.toDF()
  }
}
