package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo._
import graft.model.{Dtypes, TileCodec}

class CoreSpec extends AnyFunSuite {

  test("SplitMix64 reference vector") {
    // splitmix64(seed=0) first outputs (public reference sequence)
    assert(SplitMix64.mix(0L) == 0xe220a8397b1dcdafL)
    assert(SplitMix64.mix(SplitMix64.GOLDEN) == 0x6e789e6aa1b965f4L)
    // keyed hash is stable and seed-sensitive
    assert(SplitMix64.hash(42L, 1L) != SplitMix64.hash(42L, 2L))
    // bit-exact reference form: splitmix64(seed ^ gid) (sampling.py:229)
    assert(SplitMix64.hash(7L, 3L) == SplitMix64.mix(3L ^ 7L))
    val u = SplitMix64.uniform(123L, 42L)
    assert(u >= 0.0 && u < 1.0)
  }

  test("Affine xy2ij/ij2xy round-trip and bounds") {
    val a = Affine.fromOrigin(478000, 3108140, 30, 30)
    assert(a.centerXY(0, 0) == (478015.0, 3108125.0))
    assert(a.ij(478015.0, 3108125.0) == (0, 0))
    assert(a.ij(478000.0 + 30 * 5 + 1, 3108140.0 - 30 * 7 - 1) == (7, 5))
    val (minx, miny, maxx, maxy) = a.bounds(10, 20)
    assert(minx == 478000 && maxx == 478000 + 600)
    assert(maxy == 3108140 && miny == 3108140 - 300)
    assert(a.translate(10, -5).xmin == 478010)
    assert(a.forTile(2, 3).ulXY(0, 0) == a.ulXY(2, 3))
  }

  test("default nodata table matches reference (referencing.py:239-274)") {
    assert(Affine.defaultNodata("uint8") == 255d)
    assert(Affine.defaultNodata("int16") == -32768d)
    assert(Affine.defaultNodata("float32") == -99999d)
    assert(Affine.castPixelInterpretation("Area", "Point") == null)
    assert(Affine.castPixelInterpretation("Area", "Area") == "Area")
  }

  test("CellIndex encode/decode round-trip") {
    for (lvl <- Seq(0, 3, 5, 10, 20); ix <- Seq(0L, 1L, 7L, 1000L); iy <- Seq(0L, 5L, 999L)) {
      val n = (1L << lvl) - 1
      val (cx, cy) = (math.min(ix, n), math.min(iy, n))
      val c = CellIndex.encode(lvl, cx, cy)
      assert(CellIndex.decode(c) == ((lvl, cx, cy)), s"lvl=$lvl")
    }
  }

  test("CellIndex cellOf / cover / parent / ring") {
    // level 5 over [0,128): cell size 4
    val c = CellIndex.cellOf(10.0, 9.0, 5)
    assert(CellIndex.decode(c) == ((5, 2L, 2L)))
    val cov = CellIndex.cover(9.0, 9.0, 17.0, 12.9, 5)
    // x cells 2..4, y cells 2..3 → 6 cells
    assert(cov.length == 6)
    assert(cov.contains(CellIndex.encode(5, 4, 3)))
    assert(CellIndex.parent(CellIndex.encode(5, 7, 5)) == CellIndex.encode(4, 3, 2))
    assert(CellIndex.children(CellIndex.encode(4, 3, 2)).contains(CellIndex.encode(5, 7, 5)))
    assert(CellIndex.ring(CellIndex.encode(5, 2, 2), 1).length == 9)
    assert(CellIndex.ring(CellIndex.encode(5, 0, 0), 1).length == 4) // domain-clipped
    assert(CellIndex.ringShell(CellIndex.encode(5, 2, 2), 1).length == 8)
    // nesting: every child's bounds inside parent's
    val (pminx, pminy, pmaxx, pmaxy) = CellIndex.cellBounds(CellIndex.encode(4, 3, 2))
    CellIndex.children(CellIndex.encode(4, 3, 2)).foreach { ch =>
      val (a, b, x, y) = CellIndex.cellBounds(ch)
      assert(a >= pminx && b >= pminy && x <= pmaxx && y <= pmaxy)
    }
  }

  test("TileCodec pack/unpack and mask algebra") {
    val d = Array(1.0, -2.5, 3.25, Double.MaxValue, 0.0)
    assert(TileCodec.unpackDoubles(TileCodec.packDoubles(d)).sameElements(d))
    val m = Array(true, false, true, true, false)
    val packed = TileCodec.packMask(m)
    assert(TileCodec.unpackMask(packed, 5).sameElements(m))
    assert(TileCodec.countValid(packed, 5) == 3)
    val m2 = TileCodec.packMask(Array(true, true, false, true, false))
    assert(TileCodec.unpackMask(TileCodec.maskAnd(packed, m2), 5)
      .sameElements(Array(true, false, false, true, false)))
    assert(TileCodec.unpackMask(TileCodec.maskOr(packed, m2), 5)
      .sameElements(Array(true, true, true, true, false)))
    assert(TileCodec.unpackMask(TileCodec.maskXor(packed, m2), 5)
      .sameElements(Array(false, true, true, false, false)))
    assert(TileCodec.unpackMask(TileCodec.maskNot(packed, 5), 5)
      .sameElements(Array(false, true, false, false, true)))
  }

  test("dtype promotion rules (raster.py:226-321)") {
    assert(Dtypes.promote("uint8", "uint8") == "uint8")
    assert(Dtypes.promote("uint8", "int8") == "int16")
    assert(Dtypes.promote("int16", "float32") == "float32")
    assert(Dtypes.promote("bool", "uint8") == "uint8")
    assert(Dtypes.promote("uint32", "int32") == "int64")
    assert(Dtypes.promote("int64", "float64") == "float64")
    assert(Dtypes.combineNodata(Double.NaN, 7.0, "float64") == 7.0)
    assert(Dtypes.combineNodata(Double.NaN, Double.NaN, "float32") == -99999d)
  }

  test("minhash/jaccard/simhash determinism") {
    import graft.ops.TextOps
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "the quick brown fox jumps over the lazy cat"
    val c = "completely different words here nothing shared at all"
    assert(TextOps.minhashSig(a, 3, 32).sameElements(TextOps.minhashSig(a, 3, 32)))
    assert(TextOps.jaccard(a, a) == 1.0)
    assert(TextOps.jaccard(a, b) > TextOps.jaccard(a, c))
    assert(TextOps.simhash(a) == TextOps.simhash(a))
    def popcount(x: Long) = java.lang.Long.bitCount(x)
    assert(popcount(TextOps.simhash(a) ^ TextOps.simhash(b)) <
           popcount(TextOps.simhash(a) ^ TextOps.simhash(c)))
    assert(TextOps.fingerprint(a) != TextOps.fingerprint(b))
  }
}
