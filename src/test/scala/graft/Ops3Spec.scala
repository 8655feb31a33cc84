package graft

import org.apache.spark.sql.functions._
import graft.io.{GeoTables, RasterGen}
import graft.ops._

class Ops3Spec extends SparkSpec {

  test("multimodal: media resolve + stub features are deterministic and complete") {
    import spark.implicits._
    val refs = Seq("tile://dem/0/1/2", "tile://dem/0/7/7", "tile://dem/0/0/0")
      .toDF("media_ref")
    val out = Multimodal.extractFeatures(Multimodal.resolveMedia(refs, RasterGen.tiles(spark)))
      .collect().map(r => r.getAs[String]("media_ref") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Int]("width"), r.getAs[Long]("checksum"))).toMap
    assert(out.size == 3)
    out.values.foreach { case (n, w, _) => assert(n == 20000 && w == 50) }
    // checksum equals local recompute of the packed payload
    val t = RasterGen.makeTile(1, 2)
    var c = 1469598103934665603L
    t.data.foreach(b => c = (c ^ b) * 1099511628211L)
    assert(out("tile://dem/0/1/2")._3 == c)
  }

  test("multimodal: blob resize + frame sampling match local recompute") {
    import spark.implicits._
    val refs = Seq("tile://dem/0/1/2").toDF("media_ref")
    val resolved = Multimodal.resolveMedia(refs, RasterGen.tiles(spark))
    // synthetic dem: global v(i,j) = (i*7+j*13)%97, valid (i*31+j*17)%101 != 0;
    // tile (1,2) covers global rows 50..99, cols 100..149
    def v(i: Int, j: Int) = ((i * 7 + j * 13) % 97).toDouble
    def ok(i: Int, j: Int) = (i * 31 + j * 17) % 101 != 0

    val rz = Multimodal.resizeMedia(resolved, 2)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    var blocks = 0
    for (bi <- 0 until 25; bj <- 0 until 25) {
      val vs = for (di <- 0 to 1; dj <- 0 to 1
                    if ok(50 + 2 * bi + di, 100 + 2 * bj + dj))
        yield v(50 + 2 * bi + di, 100 + 2 * bj + dj)
      if (vs.isEmpty) assert(!rz.contains((bi, bj)))
      else { assert(rz((bi, bj)) == vs.sum / vs.size, s"block ($bi,$bj)"); blocks += 1 }
    }
    assert(blocks > 600)

    val fr = Multimodal.sampleFrames(resolved, 5)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(fr.keySet == (0 until 50 by 5).toSet)
    for (f <- 0 until 50 by 5) {
      val vs = for (j <- 0 until 50 if ok(50 + f, 100 + j)) yield v(50 + f, 100 + j)
      assert(fr(f)._1 == vs.size && fr(f)._2 == vs.sum / vs.size, s"frame $f")
    }
  }

  test("multimodal resize: non-divisible factor emits partial edge blocks") {
    import spark.implicits._
    val refs = Seq("tile://dem/0/1/2").toDF("media_ref")
    val resolved = Multimodal.resolveMedia(refs, RasterGen.tiles(spark))
    def v(i: Int, j: Int) = ((i * 7 + j * 13) % 97).toDouble
    def ok(i: Int, j: Int) = (i * 31 + j * 17) % 101 != 0
    // 50 % 3 != 0: blocks bi,bj = 16 cover only rows/cols 48..49 — the
    // pre-fix floor division silently dropped those pixels entirely
    val rz = Multimodal.resizeMedia(resolved, 3)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(rz.keys.map(_._1).max == 16 && rz.keys.map(_._2).max == 16)
    for (bi <- 0 until 17; bj <- 0 until 17) {
      val vs = for (li <- 3 * bi until math.min(3 * bi + 3, 50);
                    lj <- 3 * bj until math.min(3 * bj + 3, 50)
                    if ok(50 + li, 100 + lj)) yield v(50 + li, 100 + lj)
      if (vs.isEmpty) assert(!rz.contains((bi, bj)))
      else assert(rz((bi, bj)) == vs.sum / vs.size, s"block ($bi,$bj)")
    }
  }

  test("points→raster→cells round-trip (regular grid scatter)") {
    // take the dem's valid cells as points on exact centers, scatter back
    val pts = RasterOps.cells(RasterGen.tiles(spark))
      .select((lit(0.125) + col("j") * 0.25).as("x"),
              (lit(100) - 0.125 - col("i") * 0.25).as("y"),
              col("val").as("value"))
    val r2 = RasterOps.pointsToRaster(pts, 0.25, 0.25, 0, 100, 400, 400, 50, 50)
    assert(rowSet(RasterOps.cells(r2)) == rowSet(RasterOps.cells(RasterGen.tiles(spark))))
  }

  test("points→raster rejects off-grid points") {
    import spark.implicits._
    val bad = Seq((0.3, 99.875, 1.0)).toDF("x", "y", "value")
    val ex = intercept[org.apache.spark.SparkException] {
      RasterOps.pointsToRaster(bad, 0.25, 0.25, 0, 100, 400, 400, 50, 50).count()
    }
    assert(ex.getMessage.contains("off grid") ||
           Option(ex.getCause).exists(_.getMessage.contains("off grid")))
  }

  test("embedding cosine near-dup pairs: symmetric inputs give a<b pairs above threshold") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet").limit(200)
    val pairs = Similarity.cosineDupPairs(emb, threshold = 0.8)
    val got = pairs.collect()
    got.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Double]("cosine") >= 0.8)
    }
  }

  test("langId picks the dominant trigram language deterministically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "theodore thesis another anything the sing"),
      (2L, "querido los que entender los que")).toDF("doc_id", "text")
    val out = TextOps.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
  }

  test("bounds merge matches zones aggregate") {
    val z = GeoTables.zones(spark, sf001)
    val viaGeom = SparkEntry.queries("q_bounds_merge")(spark, sf001).collect()(0)
    val direct = z.agg(min("zxmin"), min("zymin"), max("zxmax"), max("zymax")).collect()(0)
    assert(viaGeom.getDouble(0) == direct.getDouble(0))
    assert(viaGeom.getDouble(3) == direct.getDouble(3))
  }

  test("dupClusters: distributed hash-min == driver union-find; roots are component minima") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val pairs = TextOps.simhashPairs(docs, 3)
    val viaUf = rowSet(TextOps.dupClusters(docs, pairs)) // driver UF path
    val viaHashMin = rowSet(TextOps.dupClusters(docs, pairs, ufThreshold = 0))
    assert(viaUf == viaHashMin, "distributed path must equal union-find")

    val cl = TextOps.dupClusters(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.nonEmpty)
    val pr = pairs.collect()
    assert(pr.nonEmpty, "corpus must contain injected near-dups")
    pr.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      assert(cl(a) == cl(b), s"pair ($a,$b) split across clusters")
    }
    cl.groupBy(_._2).foreach { case (root, members) =>
      assert(members.keys.min == root, s"root $root is not its cluster's min")
    }
  }

  test("winnowing: shared-run guarantee, rightmost-tie rule, short-doc emptiness") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e f g q"), // shares the 7-token run "a b c d e f g" >= w+k-1 = 6
      (3L, "z z z z z z z z"),     // every gram identical -> all-tie windows
      (4L, "only two")             // < k tokens -> no fingerprints
    ).toDF("doc_id", "text")
    val fp = TextOps.winnow(docs, 3, 4).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("pos"), r.getAs[Long]("hash")))

    val h1 = fp.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._3).toSet
    assert(h1.nonEmpty && h2.nonEmpty)
    assert((h1 & h2).nonEmpty, "winnowing guarantee: shared run must share a fingerprint")
    // all-equal hashes: the rightmost minimum of each window is its end
    // position -> selected positions are exactly w..m (m = 8-3+1 grams)
    assert(fp.filter(_._1 == 3L).map(_._2).sorted.toSeq == (4L to 6L).toSeq)
    assert(!fp.exists(_._1 == 4L), "docs shorter than k tokens yield nothing")
  }
}
