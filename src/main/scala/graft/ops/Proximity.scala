package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.RasterTile
import graft.io.GeoTables

/** Proximity — per-cell distance to the nearest target cell (reference
  * `raster/base.py:1879-1925`, `interface/distance.py:37-126`, which uses
  * an exact euclidean distance transform).
  *
  * Distributed choice (SURVEY.md §7.4): exact kNN join, not iterative EDT
  * relaxation — every valid cell is a query against the target-cell set
  * via the grid kNN (ring expansion + exactness bound + fallback), which
  * is provably exact and partition-invariant. Distances are geounits
  * (cell centers), matching the reference's distance_unit="georeferenced".
  */
object Proximity {

  /** Distance of every valid cell to the nearest cell with value==target.
    * Output: (i, j, dist). */
  def proximity(tiles: Dataset[RasterTile], target: Double,
                xres: Double, yres: Double, xmin: Double, ymax: Double,
                level: Int = GeoTables.KnnLevel): DataFrame = {
    val cells = RasterOps.cells(tiles)
      .withColumn("x", lit(xmin) + (col("j") + 0.5) * xres)
      .withColumn("y", lit(ymax) - (col("i") + 0.5) * yres)
    val queries = cells.select(
      (col("i").cast("long") * 1000000 + col("j")).as("qid"),
      col("x").as("qx"), col("y").as("qy"))
    val targets = cells.where(col("val") === target)
      .select(col("x"), col("y"))
    val nn = Knn.nearest(queries, targets, level)
    nn.select(floor(col("qid") / 1000000).cast("int").as("i"),
              (col("qid") % 1000000).cast("int").as("j"),
              sqrt(col("nn_d2")).as("dist"))
  }
}
