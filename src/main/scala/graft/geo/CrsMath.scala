package graft.geo

/** Minimal CRS forward/inverse math — no PROJ jars offline (SURVEY.md
  * §7.4 item 2), so the supported-EPSG subset is hand-rolled from public
  * formulas and validated by round-trip + anchor-point tests:
  *
  *  - EPSG:4326 geographic (lon/lat, degrees)
  *  - UTM zones (EPSG:326zz north / 327zz south) — transverse Mercator,
  *    Karney/Krüger series to n^4 (mm accuracy), WGS84 ellipsoid
  *  - Polar stereographic (EPSG:3031 style, standard parallel -71°)
  *
  * Reference usage: geoutils `projtools.py:42-131` (UTM helpers),
  * `:266-455` (point reprojection); reference test CRSs 32645/32718/4326.
  */
object CrsMath {
  // WGS84
  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val e2 = f * (2 - f)
  private val n = f / (2 - f)

  private val k0 = 0.9996
  private val E0 = 500000.0

  // Krüger series coefficients (Karney 2011, to n^4)
  private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
  private val A = a / (1 + n) * (1 + n2 / 4 + n4 / 64)
  private val alpha = Array(
    n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4,
    13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4,
    61.0 / 240 * n3 - 103.0 / 140 * n4,
    49561.0 / 161280 * n4)
  private val beta = Array(
    n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4,
    n2 / 48 + n3 / 15 - 437.0 / 1440 * n4,
    17.0 / 480 * n3 - 37.0 / 840 * n4,
    4397.0 / 161280 * n4)

  /** UTM forward: (lonDeg, latDeg) → (easting, northing) in `zone`
    * (1..60), `south` hemisphere flag. */
  def utmForward(lonDeg: Double, latDeg: Double, zone: Int, south: Boolean): (Double, Double) = {
    val lon0 = math.toRadians(zone * 6 - 183)
    val lat = math.toRadians(latDeg)
    val lon = math.toRadians(lonDeg) - lon0
    // conformal latitude
    val e = math.sqrt(e2)
    val sinLat = math.sin(lat)
    val t = math.sinh(atanh(sinLat) - e * atanh(e * sinLat))
    val xiP = math.atan2(t, math.cos(lon))
    val etaP = asinh(math.sin(lon) / math.hypot(t, math.cos(lon)))
    var xi = xiP; var eta = etaP
    var k = 0
    while (k < 4) {
      xi += alpha(k) * math.sin(2 * (k + 1) * xiP) * math.cosh(2 * (k + 1) * etaP)
      eta += alpha(k) * math.cos(2 * (k + 1) * xiP) * math.sinh(2 * (k + 1) * etaP)
      k += 1
    }
    val x = E0 + k0 * A * eta
    val y = (if (south) 10000000.0 else 0.0) + k0 * A * xi
    (x, y)
  }

  /** UTM inverse: (easting, northing) → (lonDeg, latDeg). */
  def utmInverse(x: Double, y: Double, zone: Int, south: Boolean): (Double, Double) = {
    val lon0 = math.toRadians(zone * 6 - 183)
    val xi = (y - (if (south) 10000000.0 else 0.0)) / (k0 * A)
    val eta = (x - E0) / (k0 * A)
    var xiP = xi; var etaP = eta
    var k = 0
    while (k < 4) {
      xiP -= beta(k) * math.sin(2 * (k + 1) * xi) * math.cosh(2 * (k + 1) * eta)
      etaP -= beta(k) * math.cos(2 * (k + 1) * xi) * math.sinh(2 * (k + 1) * eta)
      k += 1
    }
    val e = math.sqrt(e2)
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP)) // conformal latitude
    // iterate to geodetic latitude
    var lat = chi
    var dl = 1.0
    var it = 0
    while (dl > 1e-14 && it < 25) {
      val sinLat = math.sin(lat)
      val next = math.asin(math.max(-1, math.min(1,
        math.tanh(atanh(math.sin(chi)) + e * atanh(e * sinLat)))))
      dl = math.abs(next - lat); lat = next; it += 1
    }
    val lon = math.atan2(math.sinh(etaP), math.cos(xiP))
    (math.toDegrees(lon + lon0), math.toDegrees(lat))
  }

  /** Polar stereographic (south, standard parallel -71°, lon0=0 —
    * the EPSG:3031 parameterization). */
  def polarStereoForward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val e = math.sqrt(e2)
    val lat = math.toRadians(-latDeg) // work in north-pole form
    val lon = math.toRadians(lonDeg)
    def tOf(phi: Double) = math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    val phiF = math.toRadians(71.0)
    val tF = tOf(phiF)
    val mF = math.cos(phiF) / math.sqrt(1 - e2 * math.sin(phiF) * math.sin(phiF))
    val kF = mF / tF
    val t = tOf(lat)
    val rho = a * kF * t
    (rho * math.sin(lon), rho * math.cos(lon)) // south: y axis toward lon0=0... x=ρ·sinλ, y=ρ·cosλ
  }

  def polarStereoInverse(x: Double, y: Double): (Double, Double) = {
    val e = math.sqrt(e2)
    val phiF = math.toRadians(71.0)
    def tOf(phi: Double) = math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    val tF = tOf(phiF)
    val mF = math.cos(phiF) / math.sqrt(1 - e2 * math.sin(phiF) * math.sin(phiF))
    val kF = mF / tF
    val rho = math.hypot(x, y)
    val t = rho / (a * kF)
    var phi = math.Pi / 2 - 2 * math.atan(t)
    var it = 0
    while (it < 25) {
      val next = math.Pi / 2 - 2 * math.atan(t *
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2))
      if (math.abs(next - phi) < 1e-14) { phi = next; it = 25 } else { phi = next; it += 1 }
    }
    val lon = math.atan2(x, y)
    (math.toDegrees(lon), -math.toDegrees(phi))
  }

  /** EPSG helpers: `latlon_to_utm`/`utm_to_epsg` analogs
    * (projtools.py:42-131). */
  def utmZoneOf(lonDeg: Double): Int =
    math.min(60, math.max(1, ((lonDeg + 180) / 6).toInt + 1))

  def utmEpsg(zone: Int, south: Boolean): Int = (if (south) 32700 else 32600) + zone

  /** Transform factory for Reproject.transformXY: dst-CRS coords → src-CRS
    * coords, for the supported pairs. */
  def transform(fromEpsg: Int, toEpsg: Int): (Double, Double) => (Double, Double) = {
    def kind(c: Int): String =
      if (c == 4326) "ll"
      else if (c >= 32601 && c <= 32660) "utmN"
      else if (c >= 32701 && c <= 32760) "utmS"
      else if (c == 3031) "ps"
      else throw new IllegalArgumentException(s"unsupported EPSG:$c (offline CRS subset)")
    (kind(fromEpsg), kind(toEpsg)) match {
      case (a, b) if a == b && fromEpsg == toEpsg => (x, y) => (x, y)
      case ("ll", "utmN") => (lon, lat) => utmForward(lon, lat, toEpsg - 32600, south = false)
      case ("ll", "utmS") => (lon, lat) => utmForward(lon, lat, toEpsg - 32700, south = true)
      case ("utmN", "ll") => (x, y) => utmInverse(x, y, fromEpsg - 32600, south = false)
      case ("utmS", "ll") => (x, y) => utmInverse(x, y, fromEpsg - 32700, south = true)
      case ("ll", "ps")   => (lon, lat) => polarStereoForward(lon, lat)
      case ("ps", "ll")   => (x, y) => polarStereoInverse(x, y)
      case _ => throw new IllegalArgumentException(
        s"unsupported pair EPSG:$fromEpsg → EPSG:$toEpsg (route via 4326)")
    }
  }

  @inline private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
  @inline private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1))
}
