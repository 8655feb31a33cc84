package graft.ops

import org.apache.spark.sql.{Dataset, Encoders}
import graft.model.{Dtypes, RasterTile, TileCodec}

/** Cell-wise tile operators beyond map/zip (SURVEY.md §2.2): comparisons
  * producing mask rasters, mask boolean algebra, astype with nodata
  * conversion, set_nodata remasking. Mask rasters are RasterTiles with
  * dtype "bool": payload 1.0/0.0, mask = all-valid (matches the
  * reference's Mask = boolean Raster, `raster/raster.py:2280-2315`).
  */
object TileOps {

  private implicit val tileEnc = Encoders.product[RasterTile]

  /** Cell-wise comparison against a scalar → boolean mask raster
    * (`raster/raster.py:1333-1437`): invalid cells compare false. */
  def compareScalar(tiles: Dataset[RasterTile], op: String, s: Double): Dataset[RasterTile] = {
    val f: Double => Boolean = op match {
      case ">"  => _ > s
      case ">=" => _ >= s
      case "<"  => _ < s
      case "<=" => _ <= s
      case "==" => _ == s
      case "!=" => _ != s
    }
    tiles.map { t =>
      val d = TileCodec.unpackDoubles(t.data)
      val out = new Array[Double](d.length)
      val valid = new Array[Boolean](d.length)
      var i = 0
      while (i < d.length) {
        valid(i) = true
        out(i) = if (TileCodec.maskBit(t.mask, i) && f(d(i))) 1.0 else 0.0
        i += 1
      }
      t.copy(dtype = "bool", nodata = 255.0,
        data = TileCodec.packDoubles(out), mask = TileCodec.packMask(valid))
    }
  }

  /** Boolean algebra on mask rasters (`raster/raster.py:1439-1483`). */
  def maskCombine(a: Dataset[RasterTile], b: Dataset[RasterTile], op: String): Dataset[RasterTile] = {
    val f: (Boolean, Boolean) => Boolean = op match {
      case "and" => _ && _
      case "or"  => _ || _
      case "xor" => _ ^ _
    }
    RasterOps.tileZip(a, b)((x, y) => if (f(x != 0.0, y != 0.0)) 1.0 else 0.0)
  }

  def maskNot(a: Dataset[RasterTile]): Dataset[RasterTile] =
    RasterOps.tileMap(a)(v => if (v != 0.0) 0.0 else 1.0)

  /** astype: dtype cast + nodata conversion (`raster/raster.py:1485-1539`).
    * Values clamp-truncate toward the integer dtypes; nodata becomes the
    * target default when the old one doesn't fit. */
  def astype(tiles: Dataset[RasterTile], dtype: String): Dataset[RasterTile] = {
    val toInt = !dtype.startsWith("float")
    val newNodata = graft.geo.Affine.defaultNodata(dtype)
    tiles.map { t =>
      val d = TileCodec.unpackDoubles(t.data)
      val out = new Array[Double](d.length)
      var i = 0
      while (i < d.length) {
        out(i) =
          if (!TileCodec.maskBit(t.mask, i)) newNodata
          else if (toInt) math.rint(d(i))
          else d(i)
        i += 1
      }
      t.copy(dtype = dtype, nodata = newNodata, data = TileCodec.packDoubles(out))
    }
  }

  /** set_nodata (`raster/base.py:276-380`): cells equal to the NEW nodata
    * value get masked (the reference's remask-on-collision), old nodata
    * fill cells are rewritten to the new value. */
  def setNodata(tiles: Dataset[RasterTile], newNodata: Double): Dataset[RasterTile] =
    tiles.map { t =>
      val d = TileCodec.unpackDoubles(t.data)
      val out = new Array[Double](d.length)
      val valid = new Array[Boolean](d.length)
      var i = 0
      while (i < d.length) {
        val ok = TileCodec.maskBit(t.mask, i)
        valid(i) = ok && d(i) != newNodata
        out(i) = if (valid(i)) d(i) else newNodata
        i += 1
      }
      t.copy(nodata = newNodata,
        data = TileCodec.packDoubles(out), mask = TileCodec.packMask(valid))
    }

  /** Promote two rasters' dtypes/nodata for arithmetic
    * (`raster/raster.py:226-321`) — metadata-level helper. */
  def promoteMeta(a: RasterTile, b: RasterTile): (String, Double) = {
    val dt = Dtypes.promote(a.dtype, b.dtype)
    (dt, Dtypes.combineNodata(a.nodata, b.nodata, dt))
  }

  /** Multi-raster merge (`raster/multiraster.py:128-343`): stack aligned
    * rasters and reduce per cell over valid contributions
    * (mean/min/max/sum/count), masked where no raster has data. */
  def merge(stacks: Seq[Dataset[RasterTile]], reducer: String): Dataset[RasterTile] = {
    require(Seq("mean", "min", "max", "sum", "count").contains(reducer))
    val all = stacks.reduce(_ union _)
    val spark = all.sparkSession
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    all.groupByKey(t => (t.tile_row, t.tile_col))
      .mapGroups { (_, it: Iterator[RasterTile]) =>
        val ts = it.toArray
        val h = ts.head
        val n = h.width * h.height
        val sum = new Array[Double](n); val cnt = new Array[Int](n)
        val mn = Array.fill(n)(Double.MaxValue); val mx = Array.fill(n)(Double.MinValue)
        ts.foreach { t =>
          require(t.xmin == h.xmin && t.ymax == h.ymax && t.xres == h.xres,
            "merge requires aligned grids")
          val d = TileCodec.unpackDoubles(t.data)
          var i = 0
          while (i < n) {
            if (TileCodec.maskBit(t.mask, i)) {
              sum(i) += d(i); cnt(i) += 1
              if (d(i) < mn(i)) mn(i) = d(i)
              if (d(i) > mx(i)) mx(i) = d(i)
            }
            i += 1
          }
        }
        val out = new Array[Double](n); val valid = new Array[Boolean](n)
        var i = 0
        while (i < n) {
          if (cnt(i) > 0) {
            valid(i) = true
            out(i) = reducer match {
              case "mean" => sum(i) / cnt(i)
              case "min" => mn(i)
              case "max" => mx(i)
              case "sum" => sum(i)
              case "count" => cnt(i).toDouble
            }
          } else out(i) = h.nodata
          i += 1
        }
        h.copy(data = TileCodec.packDoubles(out), mask = TileCodec.packMask(valid))
      }
  }
}
