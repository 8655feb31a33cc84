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
          col("width"), col("height"), col("data"), col("mask")),
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

  /** Image-preproc resize: block-mean downsample by integer `factor`
    * (trailing rows/cols emit partial-block means, nothing is dropped),
    * entirely in the blob domain (binary in → resized pixels out). The
    * decode here is REAL — payloads are our packed tile grids — only an
    * external-format codec would be a stub. Batch shape is the
    * mapInPandas analog: one decoder loop per partition, rows streamed.
    * Blocks whose pixels are all masked are dropped (nodata propagation,
    * same rule as reproject `average`). */
  def resizeMedia(resolved: DataFrame, factor: Int): DataFrame = {
    val spark = resolved.sparkSession
    import spark.implicits._
    resolved.select(col("media_ref"), col("width"), col("height"),
        col("data"), col("mask"))
      .as[(String, java.lang.Integer, java.lang.Integer, Array[Byte], Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (ref, w0, h0, payload, mask) =>
          if (payload == null || w0 == null) Iterator.empty
          else {
            val w = w0.intValue; val h = h0.intValue
            val d = TileCodec.unpackDoubles(payload)
            val out = Array.newBuilder[(String, Int, Int, Double)]
            // ceil-divided block counts: trailing rows/cols that don't
            // fill a whole block still emit a partial-block mean (the
            // clamped loop bounds below), instead of silently vanishing
            val nbi = (h + factor - 1) / factor
            val nbj = (w + factor - 1) / factor
            var bi = 0
            while (bi < nbi) {
              var bj = 0
              while (bj < nbj) {
                var s = 0.0; var n = 0
                var li = bi * factor
                while (li < math.min((bi + 1) * factor, h)) {
                  var lj = bj * factor
                  while (lj < math.min((bj + 1) * factor, w)) {
                    val k = li * w + lj
                    if (TileCodec.maskBit(mask, k)) { s += d(k); n += 1 }
                    lj += 1
                  }
                  li += 1
                }
                if (n > 0) out += ((ref, bi, bj, s / n))
                bj += 1
              }
              bi += 1
            }
            out.result().iterator
          }
        }
      }.toDF("media_ref", "bi", "bj", "val")
  }

  /** Video-style frame sampling: treat the payload's rows as a frame
    * axis (frame f = row f of the grid — the deterministic stand-in for
    * a real container's frame decoder) and keep every `every`-th frame,
    * emitting per-frame valid-sample count and mean. The explode shape
    * (one blob row → many frame rows) is exactly the frame-sampling
    * pipeline a video corpus needs; frames with no valid samples drop. */
  def sampleFrames(resolved: DataFrame, every: Int): DataFrame = {
    val spark = resolved.sparkSession
    import spark.implicits._
    resolved.select(col("media_ref"), col("width"), col("height"),
        col("data"), col("mask"))
      .as[(String, java.lang.Integer, java.lang.Integer, Array[Byte], Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (ref, w0, h0, payload, mask) =>
          if (payload == null || w0 == null) Iterator.empty
          else {
            val w = w0.intValue; val h = h0.intValue
            val d = TileCodec.unpackDoubles(payload)
            val out = Array.newBuilder[(String, Int, Long, Double)]
            var f = 0
            while (f < h) {
              if (f % every == 0) {
                var s = 0.0; var n = 0L
                var lj = 0
                while (lj < w) {
                  val k = f * w + lj
                  if (TileCodec.maskBit(mask, k)) { s += d(k); n += 1 }
                  lj += 1
                }
                if (n > 0) out += ((ref, f, n, s / n))
              }
              f += 1
            }
            out.result().iterator
          }
        }
      }.toDF("media_ref", "frame", "n_valid", "val")
  }
}
