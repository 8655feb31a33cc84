package graft.io

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Iceberg-like snapshot/manifest semantics over plain parquet (no Iceberg
  * jars offline — SURVEY.md §7.4 item 5): every commit writes a new
  * immutable data directory plus a numbered snapshot file listing the data
  * directories visible at that version. Readers resolve a snapshot →
  * union of its data dirs, so writers never disturb concurrent readers
  * and time-travel reads are free.
  *
  * Layout: <table>/data/<uuid>/  parquet files
  *         <table>/snapshots/v00000N.txt   one data-dir path per line
  */
object TableCommit {

  private def snapDir(table: String) = s"$table/snapshots"

  def currentVersion(table: String): Int = {
    val d = Paths.get(snapDir(table))
    if (!Files.exists(d)) 0
    else {
      val it = Files.list(d).iterator()
      var v = 0
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        if (name.startsWith("v")) v = math.max(v, name.stripPrefix("v").stripSuffix(".txt").toInt)
      }
      v
    }
  }

  /** Append-commit: write df as a new data dir, snapshot = previous dirs +
    * the new one. Returns the new version. */
  def commit(df: DataFrame, table: String): Int = {
    val id = java.util.UUID.nameUUIDFromBytes(
      (table + currentVersion(table)).getBytes).toString // deterministic per version
    val dataDir = s"$table/data/$id"
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    val prev = currentVersion(table)
    val prevDirs =
      if (prev == 0) Seq.empty
      else Files.readString(Paths.get(f"${snapDir(table)}/v$prev%06d.txt")).split("\n").toSeq
    Files.createDirectories(Paths.get(snapDir(table)))
    val v = prev + 1
    Files.writeString(Paths.get(f"${snapDir(table)}/v$v%06d.txt"),
      (prevDirs :+ dataDir).mkString("\n"))
    v
  }

  /** Overwrite-commit: snapshot contains only the new data dir. */
  def commitOverwrite(df: DataFrame, table: String): Int = {
    val prev = currentVersion(table)
    val id = java.util.UUID.nameUUIDFromBytes((table + prev + "ow").getBytes).toString
    val dataDir = s"$table/data/$id"
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    Files.createDirectories(Paths.get(snapDir(table)))
    val v = prev + 1
    Files.writeString(Paths.get(f"${snapDir(table)}/v$v%06d.txt"), dataDir)
    v
  }

  /** Read a snapshot (default: latest). Time travel = pass a version. */
  def read(spark: SparkSession, table: String, version: Int = -1): DataFrame = {
    val v = if (version < 0) currentVersion(table) else version
    require(v > 0, s"no snapshots in $table")
    val dirs = Files.readString(Paths.get(f"${snapDir(table)}/v$v%06d.txt")).split("\n")
    spark.read.parquet(dirs.toIndexedSeq: _*)
  }

  private def snapshotDirs(table: String, version: Int): Seq[String] =
    if (version <= 0) Seq.empty
    else Files.readString(Paths.get(f"${snapDir(table)}/v$version%06d.txt"))
      .split("\n").toSeq

  /** Incremental read: only the data added between `fromVersion`
    * (exclusive) and `toVersion` (inclusive; -1 = latest) — the
    * changelog consumers use to process ONLY new documents since their
    * last run instead of rescanning 100 TB. Data dirs are immutable, so
    * the diff of the two manifests IS the appended data; an
    * overwrite-commit in the range surfaces as its full (replacement)
    * contents, the append-only fast path never reads a byte twice. An
    * empty diff returns an empty frame with the table's schema. */
  def readIncremental(spark: SparkSession, table: String,
                      fromVersion: Int, toVersion: Int = -1): DataFrame = {
    val to = if (toVersion < 0) currentVersion(table) else toVersion
    require(fromVersion <= to,
      s"fromVersion $fromVersion is newer than toVersion $to")
    val newDirs = snapshotDirs(table, to)
      .diff(snapshotDirs(table, fromVersion))
    if (newDirs.isEmpty) read(spark, table, to).limit(0)
    else spark.read.parquet(newDirs: _*)
  }

  /** Compaction: rewrite the CURRENT snapshot as `numFiles` files in one
    * overwrite-commit (readers on older versions are undisturbed —
    * that's the snapshot contract). `sortCols` optionally clusters rows
    * (e.g. by a Z-order cell column) via a range-partitioned sort, so
    * parquet row-group min/max stats line up with spatial predicates and
    * scans after compaction skip non-matching files. Returns the new
    * version. */
  def compact(spark: SparkSession, table: String, numFiles: Int,
              sortCols: Seq[String] = Seq.empty): Int = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val cur = read(spark, table)
    val laid =
      if (sortCols.isEmpty) cur.repartition(numFiles)
      else cur.repartitionByRange(numFiles,
        sortCols.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    commitOverwrite(laid, table)
  }

  /** Copy-on-write MERGE (upsert by `keyCol`): rows in `updates` replace
    * same-key rows in the current snapshot; unmatched update keys are
    * inserts. Only the data dirs whose [min, max] key range intersects an
    * update key are rewritten — on a table laid out by
    * [[compact]]`(sortCols = keyCol :: _)` the dir ranges are disjoint, so
    * a point update rewrites ONE dir while the petabytes in the others are
    * carried into the new snapshot by reference (the Iceberg
    * copy-on-write contract). Costs: one footer-level min/max per dir
    * (parquet aggregate pushdown — no row reads), one manifest-sized
    * range×key semi-join to pick touched dirs, one rewrite of
    * touched-dirs ∖ update-keys ∪ updates. Older versions stay readable.
    *
    * `updates` must be key-unique and schema-compatible with the table;
    * duplicate update keys would all survive the rewrite (same as
    * Iceberg's MERGE cardinality check firing).
    *
    * @return (new version, number of data dirs rewritten) */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
            keyCol: String): (Int, Int) = {
    import org.apache.spark.sql.functions.{col, min, max}
    val prev = currentVersion(table)
    val dirs = snapshotDirs(table, prev)
    require(dirs.nonEmpty, s"no snapshots in $table")
    // footer-only stats scan per dir (no filter, flat column → pushes down)
    val pushdown = "spark.sql.parquet.aggregatePushdown"
    val saved = spark.conf.getOption(pushdown)
    spark.conf.set(pushdown, "true")
    val ranges =
      try dirs.map { d =>
        val r = spark.read.parquet(d)
          .agg(min(col(keyCol)).as("mn"), max(col(keyCol)).as("mx")).head()
        (d, r.get(0), r.get(1))
      } finally saved match {
        case Some(v) => spark.conf.set(pushdown, v)
        case None    => spark.conf.unset(pushdown)
      }
    // touched = dirs whose range holds at least one update key; ONE
    // manifest-sized job (|dirs| rows), not a per-dir probe
    val kt = updates.schema(keyCol).dataType
    val rangeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("dir",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("mn", kt),
      org.apache.spark.sql.types.StructField("mx", kt)))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(ranges.map { case (d, mn, mx) =>
        org.apache.spark.sql.Row(d, mn, mx) }: _*)
    val rangeDf = spark.createDataFrame(rows, rangeSchema)
    val touched = rangeDf.join(updates.select(col(keyCol).as("k")).distinct(),
        col("k") >= col("mn") && col("k") <= col("mx"), "left_semi")
      .select("dir").collect().map(_.getString(0)).toSeq
    val untouched = dirs.diff(touched)
    val rewritten =
      if (touched.isEmpty) updates // pure insert
      else spark.read.parquet(touched: _*)
        .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
        .unionByName(updates)
    val id = java.util.UUID.nameUUIDFromBytes((table + prev + "mrg").getBytes).toString
    val dataDir = s"$table/data/$id"
    rewritten.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    Files.createDirectories(Paths.get(snapDir(table)))
    val v = prev + 1
    Files.writeString(Paths.get(f"${snapDir(table)}/v$v%06d.txt"),
      (untouched :+ dataDir).mkString("\n"))
    (v, touched.size)
  }

  /** Snapshot expiry + vacuum: keep the newest `keep` snapshot files,
    * delete older ones, then delete every data dir no surviving snapshot
    * references (the unbounded-growth reaper — compaction and overwrite
    * commits orphan their inputs, which otherwise live forever).
    * Returns the deleted data dirs. Time travel to an expired version
    * fails by design; readers mid-scan on just-expired data are the same
    * hazard Iceberg's expire_snapshots documents — run it with a grace
    * period in production. */
  def expireSnapshots(table: String, keep: Int = 1): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val cur = currentVersion(table)
    val cutoff = cur - keep + 1
    val live = (cutoff to cur).flatMap(v => snapshotDirs(table, v)).toSet
    val dead = (1 until cutoff)
      .flatMap(v => snapshotDirs(table, v)).distinct.filterNot(live)
    (1 until cutoff).foreach { v =>
      Files.deleteIfExists(Paths.get(f"${snapDir(table)}/v$v%06d.txt"))
    }
    dead.foreach { d =>
      val p = Paths.get(d)
      if (Files.exists(p)) {
        val it = Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]()).iterator()
        while (it.hasNext) Files.delete(it.next())
      }
    }
    dead
  }
}
