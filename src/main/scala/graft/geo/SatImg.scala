package graft.geo

import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter

/** Satellite-image filename metadata tables — the real platform/sensor/
  * product/version/tile/datetime parsers of the reference
  * (`raster/satimg.py:52-372`), covering Landsat (pre/post-collection
  * naming), Sentinel-2, PGC SETSM DEMs (old + s2s04x nomenclature), SPOT,
  * IceBridge IODEM3/ILAKS1B, ASTER L1A/ASTGTM2, NASADEM, TanDEM-X, SRTM
  * v4.1 and .hgt tiles, plus the southwestern-corner tile-name coordinate
  * conventions (`satimg.py:219-312`).
  */
object SatImg {

  final case class Meta(platform: String, sensor: String, product: String,
                        version: String, tile_name: String, datetime: String)

  private val LsatSensor = Map("C" -> "OLI/TIRS", "E" -> "ETM+", "T" -> "TM",
    "M" -> "MSS", "O" -> "OLI")

  private val D8 = DateTimeFormatter.ofPattern("yyyyMMdd")
  private val D14 = DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
  private val S2T = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")
  private val AstFmt = DateTimeFormatter.ofPattern("MMddyyyyHHmmss")
  // fixed-width form (ISO_LOCAL_DATE_TIME drops :00 seconds)
  private def iso(d: LocalDateTime): String =
    d.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
  private val Srtm = iso(LocalDate.of(2000, 2, 15).atStartOfDay)

  private def basename(filename: String): (String, String) = {
    val base = filename.split('/').last
    val dot = base.lastIndexOf('.')
    if (dot < 0) (base, "") else (base.substring(0, dot), base.substring(dot))
  }

  /** Landsat (`satimg.py:55-79`): pre-collection compact names
    * (LC81400412017123…) and collection names (LC08_L1TP_140041_20170503_…). */
  private def parseLandsat(gname: String): Meta = {
    val spl = gname.split("_")
    if (spl(0).length > 15) {
      val year = gname.substring(9, 13).toInt
      val doy = gname.substring(13, 16).toInt
      val d = LocalDate.ofYearDay(year, doy).atStartOfDay
      Meta(s"Landsat ${gname.substring(2, 3).toInt}",
        LsatSensor(gname.substring(1, 2)), null, null,
        gname.substring(3, 9), iso(d))
    } else {
      Meta(s"Landsat ${spl(0).substring(2, 4).toInt}",
        LsatSensor(spl(0).substring(1, 2)), null, null,
        spl(2), iso(LocalDate.parse(spl(3), D8).atStartOfDay))
    }
  }

  /** parse_metadata_from_fn (`satimg.py:82-183`). Unknown → all-null. */
  def parseMetadata(filename: String): Meta = {
    val (bname, ext) = basename(filename)
    val none = Meta(null, null, null, null, null, null)
    try {
      if (bname.contains("_")) {
        val spl = bname.split("_")
        // python re.match is PREFIX match — mirror with .* tails
        if (spl(0).matches("L[COTEM][0-9]{2}.*") || (spl(0).startsWith("L") && spl.length == 1))
          parseLandsat(bname)
        else if (spl(0).matches("T[0-9]{2}[A-Z]{3}.*"))
          Meta("Sentinel-2", "MSI", null, null, spl(0).substring(1),
            iso(LocalDateTime.parse(spl(1), S2T)))
        else if (spl(0) == "SETSM") {
          // s2s04x nomenclature puts the version first (satimg.py:115-126)
          val (version, idx) = if (spl(1).startsWith("s")) (spl(1), 1) else (spl(7), 0)
          Meta("WorldView", spl(idx + 1), "ArcticDEM/REMA/EarthDEM", version,
            null, iso(LocalDate.parse(spl(idx + 2), D8).atStartOfDay))
        }
        else if (spl(0) == "SPOT")
          Meta("HFS", "SPOT5", null, null, null,
            iso(LocalDate.parse(spl(2), D8).atStartOfDay))
        else if (spl(0) == "IODEM3")
          Meta("IceBridge", "DMS", "IODEM3", null, null,
            iso(LocalDateTime.parse(spl(1) + spl(2), D14)))
        else if (spl(0) == "ILAKS1B")
          Meta("IceBridge", "UAF-LS", "ILAKS1B", null, null,
            iso(LocalDate.parse(spl(1), D8).atStartOfDay))
        else if (spl(0) == "AST" && spl(1) == "L1A")
          Meta("Terra", "ASTER", "L1A", spl(2).substring(2, 3), null,
            iso(LocalDateTime.parse(spl(2).substring(3), AstFmt)))
        else if (spl(0) == "ASTGTM2")
          Meta("Terra", "ASTER", "ASTGTM2", "2", spl(1), null)
        else if (spl(0) == "NASADEM")
          Meta("SRTM", "SRTM", "NASADEM-" + spl(1), "1", spl(2), Srtm)
        else if (spl(0) == "TDM1" && spl(1) == "DEM")
          Meta("TanDEM-X", "TanDEM-X", "TDM1", "1", spl(4), null)
        else if (spl(0) == "srtm")
          Meta("SRTM", "SRTM", "SRTMv4.1", null, spl.drop(1).mkString("_"), Srtm)
        else none
      } else if (ext == ".hgt")
        Meta("SRTM", "SRTM", "SRTMGL1", "3", bname, Srtm)
      else none
    } catch { case _: Exception => none }
  }

  /** Southwestern-corner tile name → (lat, lon) (`satimg.py:219-258`):
    * robust to case, 2/3-digit latitudes, and reversed (WxxxNyy) forms. */
  def swNamingToLatLon(tileName0: String): (Double, Double) = {
    val t = tileName0.toUpperCase
    t.charAt(0) match {
      case 'S' | 'N' =>
        val (latPart, lonSigned) =
          if (t.contains("W")) (t.substring(1).split("W")(0), -t.substring(1).split("W")(1).toInt)
          else if (t.contains("E")) (t.substring(1).split("E")(0), t.substring(1).split("E")(1).toInt)
          else throw new IllegalArgumentException(s"No W/E in tile name $t")
        val lat = if (t.charAt(0) == 'S') -latPart.toInt else latPart.toInt
        (lat.toDouble, lonSigned.toDouble)
      case 'W' | 'E' =>
        val (lonPart, latSigned) =
          if (t.contains("S")) (t.substring(1).split("S")(0), -t.substring(1).split("S")(1).toInt)
          else if (t.contains("N")) (t.substring(1).split("N")(0), t.substring(1).split("N")(1).toInt)
          else throw new IllegalArgumentException(s"No S/N in tile name $t")
        val lon = if (t.charAt(0) == 'W') -lonPart.toInt else lonPart.toInt
        (latSigned.toDouble, lon.toDouble)
      case _ => throw new IllegalArgumentException(s"Tile not recognized: $t")
    }
  }

  /** (lat, lon) → southwestern-corner tile name (`satimg.py:268-312`),
    * with latitude-dependent tile sizes (TDX convention). */
  def latLonToSwNaming(lat0: Double, lon0: Double,
                       latlonSizes: Seq[(Double, Double)] = Seq((1.0, 1.0)),
                       latLims: Seq[(Double, Double)] = Seq((0.0, 90.1))): String = {
    val lon = ((lon0 + 180) % 360 + 360) % 360 - 180
    val lat = ((lat0 + 90) % 180 + 180) % 180 - 90
    val strLat = if (lat < 0) "S" else "N"
    val strLon = if (lon < 0) "W" else "E"
    latLims.indices.collectFirst {
      case i if latLims(i)._1 <= math.abs(lat) && math.abs(lat) < latLims(i)._2 =>
        val latC = math.floor(lat / latlonSizes(i)._1) * latlonSizes(i)._1
        val lonC = math.floor(lon / latlonSizes(i)._2) * latlonSizes(i)._2
        f"$strLat${math.abs(latC).toInt}%02d$strLon${math.abs(lonC).toInt}%03d"
    }.getOrElse(throw new IllegalArgumentException("lat/lon outside intervals"))
  }

  /** Tile attributes (ymin, xmin, ysize, xsize, epsg) per product
    * (`satimg.py:185-216`): SRTM-family 1×1°; TDX widens with latitude. */
  def parseTileAttr(tileName: String, product: String): (Double, Double, Int, Int, Int) = {
    val (ymin, xmin) = swNamingToLatLon(tileName)
    product match {
      case null | "ASTGTM2" | "SRTMGL1" | "NASADEM" => (ymin, xmin, 1, 1, 4326)
      case "TDM1" =>
        val xs = if (ymin >= 80 || ymin < -80) 4 else if (ymin >= 60 || ymin < -60) 2 else 1
        (ymin, xmin, 1, xs, 4326)
      case p => throw new IllegalArgumentException(s"Tile naming $tileName not recognized for product $p")
    }
  }
}
