package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** get_stats percentile-family bundle (reference `stats/stats.py:36-299`:
  * mean/median/NMAD/LE90/RMSE/IQR/std + counts) with a scale gate.
  *
  * Exact `percentile` funnels a per-distinct-value map through a single
  * reducer — correct and fine up to ~10^7 distinct values, but at raster
  * scale (10^11 cells of near-continuous values) that map IS the data.
  * `exact = false` switches every quantile to `approx_percentile` with
  * accuracy 10000 (rank error ≤ n/10000, i.e. ≤0.01% of the distribution
  * per Spark's Greenwald-Khanna bound) which aggregates in fixed memory
  * per partition and combines associatively — the 100 TB path. Oracle
  * queries keep the exact path so DuckDB comparisons stay bit-stable.
  */
object StatsBundle {

  def bundle(points: DataFrame, c: String, exact: Boolean = true): DataFrame = {
    def pct(e: String, p: Double): String =
      if (exact) s"percentile($e, $p)" else s"approx_percentile($e, $p, 10000)"
    val med = points.agg(expr(pct(c, 0.5)).as("m"))
    points.crossJoin(med).agg(
      count(lit(1)).as("n"),
      sum(col(c)).as("sum_val"),
      round(avg(col(c)), 3).as("avg_val"),
      min(col(c)).as("min_val"),
      max(col(c)).as("max_val"),
      round(stddev(col(c)), 6).as("std_val"),
      round(expr(pct(c, 0.5)), 6).as("median_val"),
      round(expr(pct(c, 0.05)), 6).as("p05"),
      round(expr(pct(c, 0.95)), 6).as("p95"),
      round(expr(s"${pct(c, 0.95)} - ${pct(c, 0.05)}"), 6).as("le90"),
      round(expr(s"${pct(c, 0.75)} - ${pct(c, 0.25)}"), 6).as("iqr"),
      round(expr(s"1.4826 * ${pct(s"abs($c - m)", 0.5)}"), 6).as("nmad"),
      round(sqrt(avg(col(c) * col(c))), 6).as("rmse"))
  }
}
