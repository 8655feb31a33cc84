package graft.ops

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.model.{RasterTile, TileCodec}

/** Focal (stencil) filters with cross-tile halo exchange — the distributed
  * translation of the reference's `map_overlap` (filters.py:74-261):
  * each output tile gathers its ring-1 neighbor tiles (an equi self-join on
  * tile keys), assembles a padded block, applies the kernel, trims.
  * Halo depth = kernel radius, per `filters.py:74-109`.
  *
  * Kernels: mean / min / max / median over a (2r+1)² window of VALID cells
  * (masked-array semantics: invalid cells don't contribute; output cell is
  * invalid only where the input cell was invalid).
  */
object Filters {

  def focal(tiles: Dataset[RasterTile], kernel: String, radius: Int,
            tilesX: Int, tilesY: Int): Dataset[RasterTile] = {
    require(Seq("mean", "min", "max", "median").contains(kernel), kernel)
    val spark = tiles.sparkSession
    import spark.implicits._

    // each tile contributes itself to all ring-1 neighbors (incl. self)
    val contrib = tiles.flatMap { t =>
      for {
        dr <- -1 to 1; dc <- -1 to 1
        tr = t.tile_row + dr; tc = t.tile_col + dc
        if tr >= 0 && tr < tilesY && tc >= 0 && tc < tilesX
      } yield (tr, tc, t)
    }

    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    contrib.groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Int, Int), it: Iterator[(Int, Int, RasterTile)]) =>
        val (tr, tc) = key
        val ts = it.map(_._3).toArray
        val center = ts.find(t => t.tile_row == tr && t.tile_col == tc).get
        val w = center.width; val h = center.height
        val pw = w + 2 * radius; val ph = h + 2 * radius
        val pad = new Array[Double](pw * ph)
        val pvalid = new Array[Boolean](pw * ph)
        // assemble padded block from whichever neighbors exist
        ts.foreach { t =>
          val d = TileCodec.unpackDoubles(t.data)
          val offI = (t.tile_row - tr) * h + radius
          val offJ = (t.tile_col - tc) * w + radius
          var i = 0
          while (i < t.height) {
            val pi = i + offI
            if (pi >= 0 && pi < ph) {
              var j = 0
              while (j < t.width) {
                val pj = j + offJ
                if (pj >= 0 && pj < pw) {
                  val k = i * t.width + j
                  pad(pi * pw + pj) = d(k)
                  pvalid(pi * pw + pj) = TileCodec.maskBit(t.mask, k)
                }
                j += 1
              }
            }
            i += 1
          }
        }
        val out = new Array[Double](w * h)
        val ovalid = new Array[Boolean](w * h)
        val window = new Array[Double]((2 * radius + 1) * (2 * radius + 1))
        var i = 0
        while (i < h) {
          var j = 0
          while (j < w) {
            val k = i * w + j
            if (pvalid((i + radius) * pw + (j + radius))) {
              var n = 0; var sum = 0.0
              var mn = Double.MaxValue; var mx = Double.MinValue
              var di = -radius
              while (di <= radius) {
                var dj = -radius
                while (dj <= radius) {
                  val pk = (i + radius + di) * pw + (j + radius + dj)
                  if (pvalid(pk)) {
                    val v = pad(pk)
                    window(n) = v; n += 1; sum += v
                    if (v < mn) mn = v; if (v > mx) mx = v
                  }
                  dj += 1
                }
                di += 1
              }
              out(k) = kernel match {
                case "mean" => sum / n
                case "min"  => mn
                case "max"  => mx
                case "median" =>
                  val a = java.util.Arrays.copyOf(window, n)
                  java.util.Arrays.sort(a)
                  if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2.0
              }
              ovalid(k) = true
            } else { out(k) = center.nodata; ovalid(k) = false }
            j += 1
          }
          i += 1
        }
        center.copy(data = TileCodec.packDoubles(out), mask = TileCodec.packMask(ovalid))
      }(Encoders.product[RasterTile])
  }
}
