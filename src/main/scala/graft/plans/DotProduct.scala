package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen dot product over two `array<double>` columns.
  *
  * Why a custom Catalyst Expression (SURVEY §7.3 escape hatch): the
  * composable form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is correct
  * but higher-order functions run interpreted — per-element lambda dispatch
  * made cosine scoring the bench bottleneck (~10 s at sf0.1). This
  * expression emits a tight loop inside whole-stage codegen and reduces in
  * the SAME strictly-sequential left-to-right IEEE order, so results are
  * bit-identical to the HOF form and to DuckDB's list_reduce oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers (VectorFns) cast both sides to array<double>; no implicit
  // coercion is attempted here.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Ragged inputs yield NULL — the same result the HOF form (zip_with pads
  // with null, which poisons the sum) and the DuckDB oracle produce, so the
  // three implementations stay agreement-testable even on malformed data.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double ${ev.value}_s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${ev.value}_s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = ${ev.value}_s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
