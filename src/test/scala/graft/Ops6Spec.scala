package graft

import org.apache.spark.sql.functions._
import graft.io.{GeoTables, RasterGen, TableCommit}
import graft.ops._

class Ops6Spec extends SparkSpec {

  test("buffer_metric: 1km buffer of an Everest-region point has ~pi km^2 area in UTM terms") {
    import spark.implicits._
    import graft.functions.GeoFunctions._
    val df = Seq("POINT(86.925 27.9881)").toDF("wkt")
    val buffered = df.select(st_buffer_metric(col("wkt"), lit(1000.0)).as("b"))
    // measure the buffered lon/lat polygon's area back in UTM meters
    val area = buffered.select(st_area(st_buffer_metric(col("b"), lit(0.0)))).collect()(0).getDouble(0)
    // area in degrees² is tiny; instead verify the metric roundness: width
    // in lon ≈ 1000 / (111320·cos(lat)), height in lat ≈ 1000/110574·...
    val env = buffered.select(st_envelope(col("b"))).collect()(0).getSeq[Double](0)
    val dLon = env(2) - env(0); val dLat = env(3) - env(1)
    assert(math.abs(dLat - 2 * 1000.0 / 110860.0) < 3e-4, s"dLat=$dLat")
    assert(math.abs(dLon - 2 * 1000.0 / (111320.0 * math.cos(math.toRadians(27.9881)))) < 3e-4,
      s"dLon=$dLon")
    assert(area >= 0) // parses cleanly
  }

  test("set_mask extends the mask from a Mask raster (raster.py:1541-1576)") {
    val dem = RasterGen.tiles(spark)
    val m = TileOps.compareScalar(dem, ">", 48) // true where val > 48
    val masked = RasterOps.applyMask(dem, m)    // keep only cells NOT > 48
    val r = RasterOps.stats(masked).collect()(0)
    var exp = 0L
    for (i <- 0 until 400; j <- 0 until 400
         if RasterGen.valid(i, j) && RasterGen.value(i, j) <= 48) exp += 1
    assert(r.getAs[Long]("n_valid") == exp)
  }

  test("reduce_points windowed mean matches local golden") {
    import spark.implicits._
    val pts = Seq((1L, 10.1, 89.9), (2L, 0.1, 99.9), (3L, 55.5, 44.4))
      .toDF("pid", "x", "y")
    val out = RasterOps.reducePoints(pts, RasterGen.tiles(spark), 1,
      0.25, 0.25, 0, 100, 400, 400, 50, 50)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_valid"), r.getAs[Double]("sum_val"))).toMap
    Seq((1L, 10.1, 89.9), (2L, 0.1, 99.9), (3L, 55.5, 44.4)).foreach { case (pid, x, y) =>
      val ci = math.floor((100 - y) / 0.25).toInt; val cj = math.floor(x / 0.25).toInt
      var n = 0L; var s = 0.0
      for (di <- -1 to 1; dj <- -1 to 1) {
        val i = ci + di; val j = cj + dj
        if (i >= 0 && i < 400 && j >= 0 && j < 400 && RasterGen.valid(i, j)) {
          n += 1; s += RasterGen.value(i, j)
        }
      }
      val (gn, gs) = out(pid)
      assert(gn == n && math.abs(gs - s) < 1e-9, s"pid $pid")
    }
  }

  test("TableCommit: snapshot isolation + time travel + append/overwrite") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tc").toString + "/t1"
    val v1 = TableCommit.commit(Seq(1, 2, 3).toDF("a"), dir)
    val v2 = TableCommit.commit(Seq(4, 5).toDF("a"), dir)
    assert(v1 == 1 && v2 == 2)
    assert(TableCommit.read(spark, dir).count() == 5)          // latest
    assert(TableCommit.read(spark, dir, 1).count() == 3)       // time travel
    val v3 = TableCommit.commitOverwrite(Seq(9).toDF("a"), dir)
    assert(v3 == 3 && TableCommit.read(spark, dir).count() == 1)
    assert(TableCommit.read(spark, dir, 2).count() == 5)       // old snapshot intact
  }

  test("TableCommit.readIncremental: exactly the appended batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tc").toString + "/t2"
    TableCommit.commit(Seq(1, 2, 3).toDF("a"), dir)
    TableCommit.commit(Seq(4, 5).toDF("a"), dir)
    TableCommit.commit(Seq(6).toDF("a"), dir)
    def inc(from: Int, to: Int = -1) =
      TableCommit.readIncremental(spark, dir, from, to)
        .collect().map(_.getInt(0)).toSet
    assert(inc(0) === Set(1, 2, 3, 4, 5, 6)) // from scratch = full table
    assert(inc(1) === Set(4, 5, 6))
    assert(inc(2) === Set(6))
    assert(inc(3) === Set.empty[Int]) // caught up: empty, schema intact
    assert(TableCommit.readIncremental(spark, dir, 3).schema.fieldNames
      === Array("a"))
    assert(inc(1, 2) === Set(4, 5)) // bounded range
    // an overwrite surfaces as its full replacement contents
    TableCommit.commitOverwrite(Seq(7, 8).toDF("a"), dir)
    assert(inc(3) === Set(7, 8))
  }

  test("TableCommit.compact: fewer files, same rows, old reads intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tc").toString + "/t3"
    (1 to 5).foreach(i => TableCommit.commit(
      Seq(i * 10, i * 10 + 1).toDF("a").repartition(4), dir))
    val before = TableCommit.read(spark, dir)
    val rows = before.collect().map(_.getInt(0)).toSet
    assert(before.inputFiles.length >= 10, "fixture should be fragmented")
    val v = TableCommit.compact(spark, dir, numFiles = 2)
    val after = TableCommit.read(spark, dir)
    assert(after.inputFiles.length <= 2)
    assert(after.collect().map(_.getInt(0)).toSet === rows)
    assert(TableCommit.read(spark, dir, v - 1).collect()
      .map(_.getInt(0)).toSet === rows) // pre-compaction snapshot intact
  }

  test("TableCommit.compact with sortCols clusters by the sort key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tc").toString + "/t4"
    val pts = (0 until 256).map(i => ((i * 37) % 256, i)).toDF("cell", "v")
    TableCommit.commit(pts.repartition(8), dir)
    TableCommit.compact(spark, dir, numFiles = 4, sortCols = Seq("cell"))
    // range partitioning: per-file cell ranges must be disjoint, so
    // row-group min/max stats can prune a cell-range predicate
    val byFile = TableCommit.read(spark, dir)
      .select(input_file_name().as("f"), col("cell"))
      .groupBy("f").agg(min("cell").as("lo"), max("cell").as("hi"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(byFile.length <= 4 && byFile.nonEmpty)
    byFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"file ranges overlap: $byFile")
      case _ =>
    }
  }

  test("TableCommit.merge: copy-on-write upsert rewrites only touched dirs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tc").toString + "/t6"
    // three commits with disjoint key ranges = three data dirs
    TableCommit.commit((0 to 99).map(i => (i, s"a$i")).toDF("id", "v"), dir)
    TableCommit.commit((100 to 199).map(i => (i, s"a$i")).toDF("id", "v"), dir)
    TableCommit.commit((200 to 299).map(i => (i, s"a$i")).toDF("id", "v"), dir)
    def dirsOf(v: Int) = java.nio.file.Files.readString(java.nio.file.Paths
      .get(f"$dir/snapshots/v$v%06d.txt")).split("\n").toSet
    val before = dirsOf(3).toSeq.sorted
    // updates hit only the middle dir's range, plus inserts beyond all dirs
    val upd = (Seq((150, "UPD"), (160, "UPD")) ++
      (1000 to 1004).map(i => (i, s"new$i"))).toDF("id", "v")
    val (v4, rewrittenDirs) = TableCommit.merge(spark, dir, upd, "id")
    assert(v4 == 4 && rewrittenDirs == 1)
    val after = dirsOf(4)
    // COW: two of the three dirs carried into the new snapshot BY
    // REFERENCE; the one replaced is exactly the middle-range dir
    assert(after.intersect(before.toSet).size == 2)
    val replaced = before.toSet.diff(after)
    assert(replaced.size == 1)
    val replacedIds = spark.read.parquet(replaced.head)
      .collect().map(_.getInt(0)).toSet
    assert(replacedIds == (100 to 199).toSet)
    val got = TableCommit.read(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got.size == 305) // 300 originals + 5 inserts (updates replace)
    assert(got(150) == "UPD" && got(160) == "UPD" && got(151) == "a151")
    assert(got(1002) == "new1002" && got(0) == "a0" && got(299) == "a299")
    // time travel: pre-merge snapshot unchanged
    val old = TableCommit.read(spark, dir, 3).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(old.size == 300 && old(150) == "a150")
    // pure insert (no range hit): zero dirs rewritten, all carried
    val (v5, rw2) = TableCommit.merge(spark, dir,
      Seq((5000, "x")).toDF("id", "v"), "id")
    assert(v5 == 5 && rw2 == 0)
    assert(dirsOf(5).intersect(after).size == after.size)
    assert(TableCommit.read(spark, dir).count() == 306)
  }

  test("TableCommit.expireSnapshots: reaps orphaned dirs, keeps live ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tc").toString + "/t5"
    TableCommit.commit(Seq(1).toDF("a"), dir)
    TableCommit.commit(Seq(2).toDF("a"), dir)
    TableCommit.commitOverwrite(Seq(3).toDF("a"), dir) // orphans v1+v2 dirs
    TableCommit.commit(Seq(4).toDF("a"), dir)
    val dead = TableCommit.expireSnapshots(dir, keep = 2)
    // v1/v2's two data dirs are unreferenced by v3/v4 → deleted
    assert(dead.length === 2)
    dead.foreach(d => assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(d)), s"$d not deleted"))
    assert(TableCommit.read(spark, dir).collect().map(_.getInt(0)).toSet
      === Set(3, 4))
    assert(TableCommit.read(spark, dir, 3).collect().map(_.getInt(0)).toSet
      === Set(3)) // kept snapshot still time-travels
    intercept[Exception] { // expired snapshot is gone by design
      TableCommit.read(spark, dir, 1).collect()
    }
  }
}
