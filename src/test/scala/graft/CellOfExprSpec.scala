package graft

import org.apache.spark.sql.functions._
import graft.plans.CellOfExpr.cellOfNative
import graft.functions.GeoFunctions

class CellOfExprSpec extends SparkSpec {
  test("native codegen cell expression matches the UDF and stays in WholeStageCodegen") {
    import spark.implicits._
    val pts = io.GeoTables.points(spark, sf001)
    val both = pts.select(
      GeoFunctions.cell_of(col("x"), col("y"), lit(7)).as("u"),
      cellOfNative(col("x"), col("y"), lit(7)).as("n"))
    assert(both.where(col("u") =!= col("n")).count() == 0)
    // null propagation
    val n = Seq((Some(1.0), None: Option[Double])).toDF("x", "y")
      .select(cellOfNative(col("x"), col("y"), lit(7))).collect()(0)
    assert(n.isNullAt(0))
    // interpreted (non-codegen) path agrees too
    val e = graft.plans.CellOfExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(10.0),
      org.apache.spark.sql.catalyst.expressions.Literal(9.0),
      org.apache.spark.sql.catalyst.expressions.Literal(5))
    assert(e.eval(null) == graft.geo.CellIndex.cellOf(10.0, 9.0, 5))
    // the plan keeps the projection inside whole-stage codegen
    val plan = pts.select(cellOfNative(col("x"), col("y"), lit(7)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // '*' = inside WholeStageCodegen
  }
}
