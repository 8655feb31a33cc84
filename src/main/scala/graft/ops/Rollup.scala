package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.geo.{CellDomain, CellIndex}

/** Multi-resolution cell-histogram rollup: the per-partition
  * cell-histogram metric (BASELINE's north-star emit) aggregated up the
  * Z-order hierarchy. The corpus is scanned and shuffled ONCE, at the
  * finest level; every coarser level sums the previous level's (tiny)
  * histogram — parent cell = child indices shifted right one bit, the
  * nesting CellIndex guarantees. log-depth, no rescans, no UDF.
  */
object Rollup {

  /** @return (level, ix, iy, cnt) for every level in [minLevel, maxLevel]
    *         with at least one point in the cell. */
  def cellRollup(pts: DataFrame, xCol: String, yCol: String,
                 minLevel: Int, maxLevel: Int,
                 domain: CellDomain = CellIndex.DefaultDomain): DataFrame = {
    require(0 <= minLevel && minLevel <= maxLevel && maxLevel <= 28,
      s"need 0 <= minLevel <= maxLevel <= 28, got [$minLevel, $maxLevel]")
    val sz = domain.cellSize(maxLevel)
    var cur = pts.select(
        floor((col(xCol) - domain.x0) / sz).cast("long").as("ix"),
        floor((col(yCol) - domain.y0) / sz).cast("long").as("iy"))
      .groupBy(col("ix"), col("iy")).agg(count(lit(1)).as("cnt"))
      .withColumn("level", lit(maxLevel))
    var out = cur
    for (l <- (maxLevel - 1) to minLevel by -1) {
      // arithmetic shift = floor division, correct for negative ix too
      cur = cur.select(shiftright(col("ix"), 1).as("ix"),
          shiftright(col("iy"), 1).as("iy"), col("cnt"))
        .groupBy(col("ix"), col("iy")).agg(sum(col("cnt")).as("cnt"))
        .withColumn("level", lit(l))
      out = out.unionByName(cur)
    }
    out.select(col("level"), col("ix"), col("iy"), col("cnt").cast("long"))
  }
}
