package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/** Adaptive repartitioning by cell density (north rule): measure the
  * per-cell histogram, derive a per-cell salt factor proportional to the
  * cell's share of rows, and run the PIP join salted only where it's hot.
  * This is the data-driven version of SpatialJoin.pipSalted's uniform
  * salt — uniform salting taxes every cell; adaptive salting only fans
  * out the heavy ones (Zipfian cell distributions at 10^12-doc scale).
  */
object AdaptiveSkew {

  /** Per-cell salt factors for HOT cells only (salt ≥ 2): cold cells are
    * absent and default to 1 via the left join — the broadcast then scales
    * with the number of hot cells, not with the total cell count. */
  def saltFactors(points: DataFrame, level: Int, targetRowsPerTask: Long): DataFrame =
    points
      .withColumn("cell", graft.plans.CellOfExpr.cellOfNative(col("x"), col("y"), lit(level)))
      .groupBy(col("cell")).agg(count(lit(1)).as("rows"))
      .select(col("cell"),
        greatest(lit(1), ceil(col("rows") / targetRowsPerTask)).cast("int").as("salt"))
      .where(col("salt") > 1)

  /** PIP join with per-cell adaptive salt. Exactly the pipSalted plan, but
    * the polygon side replicates per-cell only `salt(cell)` ways and the
    * point side buckets by `pmod(hash, salt(cell))`. */
  def pipAdaptive(points: DataFrame, polys: DataFrame, level: Int,
                  targetRowsPerTask: Long = 2000000L): DataFrame = {
    val salts = saltFactors(points, level, targetRowsPerTask)

    val annotated = polys
      .withColumn("env", st_envelope(col("wkt")))
      .withColumn("is_rect", st_is_rect(col("wkt")))
    val polyCells = annotated
      .withColumn("cell", explode(geom_cover(col("wkt"), lit(level))))
      .join(broadcast(salts), Seq("cell"), "left")
      .withColumn("salt_n", coalesce(col("salt"), lit(1)))
      .withColumn("salt", explode(sequence(lit(0), col("salt_n") - 1)))

    val ptCells = points
      .withColumn("cell", graft.plans.CellOfExpr.cellOfNative(col("x"), col("y"), lit(level)))
      .join(broadcast(salts), Seq("cell"), "left")
      .withColumn("salt_n", coalesce(col("salt"), lit(1)))
      .withColumn("salt", pmod(xxhash64(col("x"), col("y")), col("salt_n")).cast("int"))

    def refine(df: DataFrame) = df
      .where(col("x") > col("env")(0) && col("x") < col("env")(2) &&
             col("y") > col("env")(1) && col("y") < col("env")(3))

    val joined = ptCells.drop("salt_n")
      .join(polyCells.drop("salt_n").hint("shuffle_hash"), Seq("cell", "salt"), "inner")
    val rect = refine(joined.where(col("is_rect")))
    val gen = refine(joined.where(!col("is_rect")))
      .where(st_contains_xy(col("wkt"), col("x"), col("y")))
    rect.unionByName(gen).drop("cell", "salt", "env", "is_rect")
  }
}
