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
}
