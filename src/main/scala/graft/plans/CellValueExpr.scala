package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for single-cell tile reads: value of cell
  * `k` of a packed tile payload, NULL when the validity bit is clear.
  * This is the per-row kernel of every point↔raster equi-join
  * (interp_points, reduce_points): the UDF version allocated two
  * substring copies + an Option box per window pixel and broke the row
  * out of whole-stage codegen — here the generated code indexes the
  * payload bytes in place (same TileCodec kernel, zero allocation).
  */
case class CellValueExpr(data: Expression, mask: Expression, k: Expression)
    extends TernaryExpression {

  override def first: Expression = data
  override def second: Expression = mask
  override def third: Expression = k

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // masked cell → NULL

  override protected def nullSafeEval(d: Any, m: Any, kv: Any): Any = {
    val kk = kv.asInstanceOf[Int]
    val mb = m.asInstanceOf[Array[Byte]]
    if (graft.model.TileCodec.maskBit(mb, kk))
      graft.model.TileCodec.readDouble(d.asInstanceOf[Array[Byte]], kk)
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dc, mc, kc) =>
      s"""
         |if (graft.model.TileCodec.maskBit($mc, $kc)) {
         |  ${ev.value} = graft.model.TileCodec.readDouble($dc, $kc);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(data = newFirst, mask = newSecond, k = newThird)
}

object CellValueExpr {
  def cellValueNative(data: Column, mask: Column, k: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(CellValueExpr(
      GraftShim.expression(data), GraftShim.expression(mask),
      GraftShim.expression(k)))
  }
}
