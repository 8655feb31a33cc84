package graft.geo

/** Axis-aligned georeferencing transform (north-up affine, the form the
  * reference works with throughout: xres, 0, xmin, 0, -yres, ymax).
  *
  * Semantics from geoutils `raster/referencing.py:35-126` (xy2ij / ij2xy
  * with Area/Point half-pixel shift), `:165-201` (res/bounds),
  * `raster/transformation.py:921-949` (translate).
  */
final case class Affine(xres: Double, yres: Double, xmin: Double, ymax: Double) {
  require(xres > 0 && yres > 0, s"resolutions must be positive: $xres, $yres")

  /** (col j, row i) pixel upper-left corner → world coords. */
  @inline def ulXY(i: Int, j: Int): (Double, Double) =
    (xmin + j * xres, ymax - i * yres)

  /** Pixel center coords (shift="center", the Area default of ij2xy —
    * ref `referencing.py:92-126`). */
  @inline def centerXY(i: Int, j: Int): (Double, Double) =
    (xmin + (j + 0.5) * xres, ymax - (i + 0.5) * yres)

  /** World coords → (row i, col j) of containing pixel
    * (floor semantics of xy2ij, ref `referencing.py:35-90`). */
  @inline def ij(x: Double, y: Double): (Int, Int) =
    (math.floor((ymax - y) / yres).toInt, math.floor((x - xmin) / xres).toInt)

  def bounds(height: Int, width: Int): (Double, Double, Double, Double) =
    (xmin, ymax - height * yres, xmin + width * xres, ymax)

  /** Shift the georeferencing only — no resampling
    * (ref `transformation.py:921-949`). */
  def translate(dx: Double, dy: Double): Affine =
    copy(xmin = xmin + dx, ymax = ymax + dy)

  /** Sub-grid transform for a tile whose upper-left pixel is (i0, j0). */
  def forTile(i0: Int, j0: Int): Affine =
    copy(xmin = xmin + j0 * xres, ymax = ymax - i0 * yres)
}

object Affine {
  /** rasterio-style from_origin(west, north, xres, yres). */
  def fromOrigin(west: Double, north: Double, xres: Double, yres: Double): Affine =
    Affine(xres, yres, west, north)

  /** Default nodata per dtype — decision table from the reference
    * (`raster/referencing.py:239-274`). */
  def defaultNodata(dtype: String): Double = dtype match {
    case "uint8" | "bool"        => 255d
    case "int8"                  => -128d
    case "uint16"                => 65535d
    case "int16"                 => -32768d
    case "uint32" | "uint64"     => 4294967295d
    case "int32" | "int64"       => -2147483648d
    case "float32" | "float64" | "float16" => -99999d
    case other => throw new IllegalArgumentException(s"no default nodata for dtype $other")
  }

  /** Pixel-interpretation casting: Area ⊗ Point → None with the
    * reference's warning semantics (`raster/referencing.py:203-232`). */
  def castPixelInterpretation(a: String, b: String): String =
    if (a == b) a else null
}
