package graft.geo

/** Array subdivision helpers (reference `raster/tiling.py:30-104`):
  * split a 2D shape into `count` near-equal contiguous blocks — the
  * reference's multiprocessing work-partitioner, and the shape picker a
  * repartition-by-region strategy wants. */
object Tiling {

  /** Rectangle closest to a square whose area covers `size`
    * (`tiling.py:30-66`). */
  def closestRectangle(size: Int): (Int, Int) = {
    val c = math.sqrt(size.toDouble).toInt
    if (c * c == size) (c, c)
    else if (c * (c + 1) >= size) (c, c + 1)
    else (c + 1, c + 1)
  }

  /** `count` unique block indices over an (h × w) grid, blocks of
    * near-equal cell count (`tiling.py:69-104`): lay the indices on the
    * closest rectangle (edge-padded when count has no integer-ish root),
    * then nearest-neighbor upscale onto the target shape. */
  def subdivideArray(h: Int, w: Int, count: Int): Array[Array[Int]] = {
    require(h > 0 && w > 0, s"expected a positive 2D shape, got ${h}x$w")
    require(count <= h.toLong * w, s"shape ${h}x$w size (${h.toLong * w}) is smaller than count ($count)")
    val (rh, rw) = closestRectangle(count)
    val pad = rh * rw - count
    // np.pad(arange(count), pad, mode='edge')[:rh*rw]
    val padded = (Array.fill(pad)(0) ++ (0 until count) ++
      Array.fill(pad)(count - 1)).take(rh * rw)
    val small = padded.grouped(rw).toArray
    // corner-aligned nearest-neighbor upscale
    @inline def src(i: Int, n: Int, m: Int): Int =
      if (n == 1) 0 else math.floor(i.toDouble * (m - 1) / (n - 1) + 0.5).toInt
    Array.tabulate(h, w)((i, j) => small(src(i, h, rh))(src(j, w, rw)))
  }
}
