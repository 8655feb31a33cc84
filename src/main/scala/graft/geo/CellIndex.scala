package graft.geo

/** Hierarchical Z-order (Morton) cell index over a fixed world domain —
  * the engine's H3/S2 stand-in (no H3/S2 jars offline; see SURVEY.md §7).
  *
  * A cell id packs (level, ix, iy): level in the top 6 bits, then the
  * bit-interleave of (ix, iy) at that level. Levels 0..28; at level L the
  * domain is a 2^L × 2^L grid. Cells nest: the parent of a cell is the
  * same Morton prefix one level up — Catalyst-friendly (pure integer
  * arithmetic, no UDF needed for the common paths).
  *
  * Plays the role of the reference's STRtree candidate pruning
  * (`interface/rasterization.py:126-160`) and of its dst→src block mapping
  * (`raster/transformation.py:373-404`): geometry → covering cells,
  * point → owning cell, equi-join on cell replaces the spatial index.
  */
final case class CellDomain(x0: Double, y0: Double, size: Double) {
  @inline def cellSize(level: Int): Double = size / (1L << level).toDouble
}

object CellIndex {
  /** Default domain covers the synthetic test world [0,128)². Real-world
    * deployments would configure e.g. global web-mercator extents. */
  val DefaultDomain: CellDomain = CellDomain(0.0, 0.0, 128.0)

  private final val MaxLevel = 28

  /** Interleave lower 29 bits of x (even positions) and y (odd). */
  def interleave(x: Long, y: Long): Long = {
    @inline def spread(v0: Long): Long = {
      var v = v0 & 0x1fffffffL
      v = (v | (v << 16)) & 0x0000ffff0000ffffL
      v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
      v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    spread(x) | (spread(y) << 1)
  }

  def deinterleave(m: Long): (Long, Long) = {
    @inline def compact(v0: Long): Long = {
      var v = v0 & 0x5555555555555555L
      v = (v | (v >> 1)) & 0x3333333333333333L
      v = (v | (v >> 2)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v >> 4)) & 0x00ff00ff00ff00ffL
      v = (v | (v >> 8)) & 0x0000ffff0000ffffL
      v = (v | (v >> 16)) & 0x00000000ffffffffL
      v
    }
    (compact(m), compact(m >> 1))
  }

  @inline def encode(level: Int, ix: Long, iy: Long): Long = {
    require(level >= 0 && level <= MaxLevel, s"level $level")
    (level.toLong << 58) | interleave(ix, iy)
  }

  @inline def level(cell: Long): Int = (cell >>> 58).toInt

  def decode(cell: Long): (Int, Long, Long) = {
    val (ix, iy) = deinterleave(cell & ((1L << 58) - 1))
    (level(cell), ix, iy)
  }

  /** Cell owning a point at a level (points outside the domain clamp). */
  def cellOf(x: Double, y: Double, lvl: Int, dom: CellDomain = DefaultDomain): Long = {
    val n = (1L << lvl) - 1
    val cs = dom.cellSize(lvl)
    val ix = math.min(n, math.max(0L, math.floor((x - dom.x0) / cs).toLong))
    val iy = math.min(n, math.max(0L, math.floor((y - dom.y0) / cs).toLong))
    encode(lvl, ix, iy)
  }

  /** All cells at `lvl` intersecting the closed bbox — the cover
    * generator behind the PIP pre-join. */
  def cover(minx: Double, miny: Double, maxx: Double, maxy: Double,
            lvl: Int, dom: CellDomain = DefaultDomain): Array[Long] = {
    val n = (1L << lvl) - 1
    val cs = dom.cellSize(lvl)
    val jx0 = math.min(n, math.max(0L, math.floor((minx - dom.x0) / cs).toLong))
    val jx1 = math.min(n, math.max(0L, math.floor((maxx - dom.x0) / cs).toLong))
    val jy0 = math.min(n, math.max(0L, math.floor((miny - dom.y0) / cs).toLong))
    val jy1 = math.min(n, math.max(0L, math.floor((maxy - dom.y0) / cs).toLong))
    val out = new Array[Long](((jx1 - jx0 + 1) * (jy1 - jy0 + 1)).toInt)
    var k = 0
    var ix = jx0
    while (ix <= jx1) {
      var iy = jy0
      while (iy <= jy1) { out(k) = encode(lvl, ix, iy); k += 1; iy += 1 }
      ix += 1
    }
    out
  }

  /** Pick a cover level so a bbox spans ≤ maxCells cells (adaptive
    * per-geometry level; small geoms index finely, large ones coarsely). */
  def coverLevel(minx: Double, miny: Double, maxx: Double, maxy: Double,
                 maxCellsPerAxis: Int, maxLvl: Int,
                 dom: CellDomain = DefaultDomain): Int = {
    val span = math.max(maxx - minx, maxy - miny) max 1e-12
    var lvl = maxLvl
    while (lvl > 0 && dom.cellSize(lvl) * maxCellsPerAxis < span) lvl -= 1
    lvl
  }

  def parent(cell: Long): Long = {
    val (lvl, ix, iy) = decode(cell)
    require(lvl > 0, "level-0 cell has no parent")
    encode(lvl - 1, ix >> 1, iy >> 1)
  }

  def children(cell: Long): Array[Long] = {
    val (lvl, ix, iy) = decode(cell)
    Array(encode(lvl + 1, ix * 2, iy * 2), encode(lvl + 1, ix * 2 + 1, iy * 2),
          encode(lvl + 1, ix * 2, iy * 2 + 1), encode(lvl + 1, ix * 2 + 1, iy * 2 + 1))
  }

  /** Ring-k neighborhood (incl. self for k≥0) clipped to the domain —
    * drives grid-aligned kNN candidate expansion. */
  def ring(cell: Long, k: Int): Array[Long] = {
    val (lvl, ix, iy) = decode(cell)
    val n = (1L << lvl) - 1
    val buf = Array.newBuilder[Long]
    var dx = -k
    while (dx <= k) {
      var dy = -k
      while (dy <= k) {
        val jx = ix + dx; val jy = iy + dy
        if (jx >= 0 && jx <= n && jy >= 0 && jy <= n) buf += encode(lvl, jx, jy)
        dy += 1
      }
      dx += 1
    }
    buf.result()
  }

  /** Cells at exactly ring distance k (the expansion frontier). */
  def ringShell(cell: Long, k: Int): Array[Long] =
    if (k == 0) Array(cell)
    else {
      val inner = ring(cell, k - 1).toSet
      ring(cell, k).filterNot(inner)
    }

  def cellBounds(cell: Long, dom: CellDomain = DefaultDomain): (Double, Double, Double, Double) = {
    val (lvl, ix, iy) = decode(cell)
    val cs = dom.cellSize(lvl)
    (dom.x0 + ix * cs, dom.y0 + iy * cs, dom.x0 + (ix + 1) * cs, dom.y0 + (iy + 1) * cs)
  }
}
