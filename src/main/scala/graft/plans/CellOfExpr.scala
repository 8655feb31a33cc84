package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the owning-cell computation — the one
  * scalar on the hot side of every spatial join (each point row computes
  * it once). Codegen emits a static call into the same CellIndex kernel
  * the UDF used, but stays inside whole-stage codegen: no UDF serde, no
  * boxing, null-propagation handled by TernaryExpression.
  *
  * (SURVEY.md §7.3: "custom Expression (codegen for cell-id computation)
  * only after profiling" — the PIP probe showed the point-side projection
  * in the hot stage.)
  */
case class CellOfExpr(x: Expression, y: Expression, lvl: Expression)
    extends TernaryExpression {

  override def first: Expression = x
  override def second: Expression = y
  override def third: Expression = lvl

  override def dataType: DataType = LongType
  override def nullable: Boolean = x.nullable || y.nullable || lvl.nullable

  override protected def nullSafeEval(xv: Any, yv: Any, lv: Any): Any =
    graft.geo.CellIndex.cellOf(xv.asInstanceOf[Double], yv.asInstanceOf[Double],
      lv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xc, yc, lc) =>
      s"${ev.value} = graft.geo.CellIndex.cellOf($xc, $yc, $lc, " +
        "graft.geo.CellIndex.DefaultDomain());")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(x = newFirst, y = newSecond, lvl = newThird)
}

object CellOfExpr {
  /** Column factory (Spark 4.x classic Column-from-Expression). */
  def cellOfNative(x: Column, y: Column, lvl: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(CellOfExpr(
      GraftShim.expression(x), GraftShim.expression(y),
      GraftShim.expression(lvl)))
  }
}
