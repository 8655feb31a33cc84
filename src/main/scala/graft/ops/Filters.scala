package graft.ops

import org.apache.spark.sql.{Dataset, Encoders}
import graft.model.{RasterTile, TileCodec}

/** Focal (stencil) filters with cross-tile halo exchange — the distributed
  * translation of the reference's `map_overlap` (filters.py:74-261).
  *
  * Shuffle shape: each tile ships ONLY the `radius`-deep border strips its
  * ring-1 neighbors need (plus itself, unshuffled-size payload, to its own
  * key) — a perimeter-proportional exchange, not the 9×-full-tile
  * broadcast. Strips carry their GLOBAL pixel origin, so partial edge
  * tiles (grid not a multiple of the tile size) place correctly: offsets
  * derive from the standard tile dims (`tileW`/`tileH`), never from a
  * neighbor's own (possibly clipped) dims.
  *
  * Kernels:
  *  - rank kernels mean/min/max/median over the (2r+1)² window of VALID
  *    cells (masked-array semantics; output invalid where input invalid)
  *  - gaussian (filters.py:264-298): NaN-aware normalized convolution —
  *    conv(filled)/conv(validmask), defined wherever ≥1 neighbor is valid
  *  - distance (filters.py:458-491): input cell dropped (masked) where
  *    |value − local gaussian mean| > threshold
  */
object Filters {

  /** One contribution to a target tile's padded frame. `center` is set on
    * the self-contribution only and carries the output tile metadata. */
  final case class Patch(tr: Int, tc: Int, gi0: Long, gj0: Long,
                         pw: Int, ph: Int,
                         data: Array[Double], valid: Array[Boolean],
                         center: Option[RasterTile])

  /** Self + 8 border strips, keyed by target tile. */
  private def contributions(tiles: Dataset[RasterTile], radius: Int,
                            tilesX: Int, tilesY: Int, tileW: Int, tileH: Int)
      : Dataset[Patch] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.flatMap { t =>
      val d = TileCodec.unpackDoubles(t.data)
      val v = TileCodec.unpackMask(t.mask, d.length)
      val gRow0 = t.tile_row.toLong * tileH // standard dims: global origin
      val gCol0 = t.tile_col.toLong * tileW
      val out = scala.collection.mutable.ArrayBuffer.empty[Patch]
      out += Patch(t.tile_row, t.tile_col, gRow0, gCol0, t.width, t.height,
        d, v, Some(t))
      var dr = -1
      while (dr <= 1) {
        var dc = -1
        while (dc <= 1) {
          if (!(dr == 0 && dc == 0)) {
            val tr = t.tile_row + dr; val tc = t.tile_col + dc
            if (tr >= 0 && tr < tilesY && tc >= 0 && tc < tilesX) {
              // the strip of THIS tile adjacent to neighbor (tr,tc)
              val i0 = if (dr > 0) math.max(0, t.height - radius) else 0
              val sh = if (dr == 0) t.height else math.min(radius, t.height)
              val j0 = if (dc > 0) math.max(0, t.width - radius) else 0
              val sw = if (dc == 0) t.width else math.min(radius, t.width)
              val sd = new Array[Double](sw * sh)
              val sv = new Array[Boolean](sw * sh)
              var i = 0
              while (i < sh) {
                var j = 0
                while (j < sw) {
                  val src = (i0 + i) * t.width + (j0 + j)
                  sd(i * sw + j) = d(src); sv(i * sw + j) = v(src)
                  j += 1
                }
                i += 1
              }
              out += Patch(tr, tc, gRow0 + i0, gCol0 + j0, sw, sh, sd, sv, None)
            }
          }
          dc += 1
        }
        dr += 1
      }
      out
    }
  }

  /** Assemble each tile's padded frame from its patches and flatMap
    * `fn(center, pad, pvalid, pw, ph)` over it. Generic so any halo
    * consumer (focal kernels, geometry_stitch polygonize) reuses the
    * strip exchange. */
  def withHalo[T](tiles: Dataset[RasterTile], radius: Int,
                  tilesX: Int, tilesY: Int, tileW: Int, tileH: Int)(
      fn: (RasterTile, Array[Double], Array[Boolean], Int, Int) => Iterator[T])(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    require(radius >= 1 && radius <= math.min(tileW, tileH),
      s"halo radius $radius must be within one tile (${tileW}x$tileH)")
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    contributions(tiles, radius, tilesX, tilesY, tileW, tileH)
      .groupByKey(p => (p.tr, p.tc))
      .flatMapGroups { (key: (Int, Int), it: Iterator[Patch]) =>
        val ps = it.toArray
        ps.find(_.center.isDefined) match {
          case None => Iterator.empty // strips but no tile here: sparse set
          case Some(cp) =>
            val center = cp.center.get
            val w = center.width; val h = center.height
            val pw = w + 2 * radius; val ph = h + 2 * radius
            // padded frame origin in global pixels (standard dims)
            val gI = key._1.toLong * tileH - radius
            val gJ = key._2.toLong * tileW - radius
            val pad = new Array[Double](pw * ph)
            val pvalid = new Array[Boolean](pw * ph)
            ps.foreach { p =>
              val offI = (p.gi0 - gI).toInt; val offJ = (p.gj0 - gJ).toInt
              var i = 0
              while (i < p.ph) {
                val pi = i + offI
                if (pi >= 0 && pi < ph) {
                  var j = 0
                  while (j < p.pw) {
                    val pj = j + offJ
                    if (pj >= 0 && pj < pw) {
                      pad(pi * pw + pj) = p.data(i * p.pw + j)
                      pvalid(pi * pw + pj) = p.valid(i * p.pw + j)
                    }
                    j += 1
                  }
                }
                i += 1
              }
            }
            fn(center, pad, pvalid, pw, ph)
        }
      }(enc)
  }

  /** Tile→tile halo map: apply `kernelFn` and repack. */
  private def mapHalo(tiles: Dataset[RasterTile], radius: Int,
                      tilesX: Int, tilesY: Int, tileW: Int, tileH: Int)(
      kernelFn: (RasterTile, Array[Double], Array[Boolean], Int, Int)
        => (Array[Double], Array[Boolean])): Dataset[RasterTile] =
    withHalo(tiles, radius, tilesX, tilesY, tileW, tileH) {
      (center, pad, pvalid, pw, ph) =>
        val (out, ovalid) = kernelFn(center, pad, pvalid, pw, ph)
        Iterator.single(center.copy(
          data = TileCodec.packDoubles(out),
          mask = TileCodec.packMask(ovalid)))
    }(Encoders.product[RasterTile])

  // ---- rank kernels ------------------------------------------------------

  def focal(tiles: Dataset[RasterTile], kernel: String, radius: Int,
            tilesX: Int, tilesY: Int,
            tileW: Int = 50, tileH: Int = 50): Dataset[RasterTile] = {
    require(Seq("mean", "min", "max", "median").contains(kernel), kernel)
    mapHalo(tiles, radius, tilesX, tilesY, tileW, tileH) {
      (center, pad, pvalid, pw, ph) =>
        val w = center.width; val h = center.height
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
        (out, ovalid)
    }
  }

  // ---- normalized (NaN-aware) separable convolution ----------------------

  /** Two-pass separable convolution of (filled, maskf) with the symmetric
    * 1D kernel `wts` (length 2r+1); returns value = num/den wherever
    * den > 0 — exactly `gaussian_filter`'s filtered/normalization
    * (filters.py:283-295). Output is defined (valid) wherever any
    * neighbor is valid, INCLUDING originally-invalid cells. */
  private def convolveNorm(center: RasterTile, pad: Array[Double],
                           pvalid: Array[Boolean], pw: Int, ph: Int,
                           wts: Array[Double]): (Array[Double], Array[Boolean]) = {
    val r = (wts.length - 1) / 2
    val w = center.width; val h = center.height
    // pass 1 (horizontal): all ph rows × central w columns
    val num1 = new Array[Double](ph * w)
    val den1 = new Array[Double](ph * w)
    var i = 0
    while (i < ph) {
      var j = 0
      while (j < w) {
        var n = 0.0; var dn = 0.0
        var dj = -r
        while (dj <= r) {
          val pk = i * pw + (j + r + dj)
          if (pvalid(pk)) { val wt = wts(dj + r); n += wt * pad(pk); dn += wt }
          dj += 1
        }
        num1(i * w + j) = n; den1(i * w + j) = dn
        j += 1
      }
      i += 1
    }
    // pass 2 (vertical): central h rows
    val out = new Array[Double](w * h)
    val ovalid = new Array[Boolean](w * h)
    i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        var n = 0.0; var dn = 0.0
        var di = -r
        while (di <= r) {
          val k1 = (i + r + di) * w + j
          val wt = wts(di + r)
          n += wt * num1(k1); dn += wt * den1(k1)
          di += 1
        }
        val k = i * w + j
        if (dn > 0) { out(k) = n / dn; ovalid(k) = true }
        else { out(k) = center.nodata; ovalid(k) = false }
        j += 1
      }
      i += 1
    }
    (out, ovalid)
  }

  /** Truncated gaussian 1D kernel, radius = round(truncate·sigma) (the
    * scipy default the reference calls with, filters.py:283). Unnormalized
    * — normalization cancels in conv(filled)/conv(mask). */
  def gaussianKernel1d(sigma: Double, truncate: Double = 4.0): Array[Double] = {
    val r = math.max(1, math.round(truncate * sigma).toInt)
    (-r to r).map(k => math.exp(-(k.toDouble * k) / (2 * sigma * sigma))).toArray
  }

  /** Gaussian filter (filters.py:264-298): NaN-aware normalized gaussian. */
  def gaussian(tiles: Dataset[RasterTile], sigma: Double,
               tilesX: Int, tilesY: Int, tileW: Int = 50, tileH: Int = 50,
               truncate: Double = 4.0): Dataset[RasterTile] =
    weighted(tiles, gaussianKernel1d(sigma, truncate), tilesX, tilesY, tileW, tileH)

  /** Normalized convolution with an arbitrary symmetric 1D kernel. With
    * INTEGER weights and integer-valued cells, every partial sum is exact
    * in doubles — the order-invariant form the DuckDB oracle reproduces. */
  def weighted(tiles: Dataset[RasterTile], wts: Array[Double],
               tilesX: Int, tilesY: Int, tileW: Int = 50, tileH: Int = 50)
      : Dataset[RasterTile] = {
    require(wts.length % 2 == 1, "kernel length must be odd")
    val r = (wts.length - 1) / 2
    mapHalo(tiles, r, tilesX, tilesY, tileW, tileH) {
      (center, pad, pvalid, pw, ph) => convolveNorm(center, pad, pvalid, pw, ph, wts)
    }
  }

  /** Distance (outlier) filter (filters.py:458-491): mask input cells
    * whose |value − local gaussian mean| exceeds `threshold`; the local
    * mean uses the same NaN-aware normalized gaussian. Pass integer `wts`
    * for an oracle-exact variant. */
  def distanceFilter(tiles: Dataset[RasterTile], wts: Array[Double],
                     threshold: Double, tilesX: Int, tilesY: Int,
                     tileW: Int = 50, tileH: Int = 50): Dataset[RasterTile] = {
    val r = (wts.length - 1) / 2
    mapHalo(tiles, r, tilesX, tilesY, tileW, tileH) {
      (center, pad, pvalid, pw, ph) =>
        val (mean, mvalid) = convolveNorm(center, pad, pvalid, pw, ph, wts)
        val w = center.width; val h = center.height
        val out = new Array[Double](w * h)
        val ovalid = new Array[Boolean](w * h)
        var i = 0
        while (i < h) {
          var j = 0
          while (j < w) {
            val k = i * w + j
            val v = pad((i + r) * pw + (j + r))
            val ok = pvalid((i + r) * pw + (j + r)) &&
              mvalid(k) && math.abs(v - mean(k)) <= threshold
            out(k) = if (ok) v else center.nodata
            ovalid(k) = ok
            j += 1
          }
          i += 1
        }
        (out, ovalid)
    }
  }
}
