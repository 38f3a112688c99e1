package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Σ x_i² over an array<double> — the self-dot-product that every L2 norm
  * computes. Reads each element once instead of twice.
  */
case class SelfDot(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_self_dot"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double ${ev.value}_s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  ${ev.value}_s += $v * $v;
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SelfDot =
    copy(child = newChild)
}

/** Optimizer rule: `graft_dot(x, x)` → `graft_self_dot(x)` whenever both
  * sides are semantically the same expression. Bit-identical result
  * (`v*v` in the same sequential order), half the array reads — norms are
  * computed for every vector in every similarity query, so the rewrite
  * applies broadly. Injected via GraftExtensions (spark.sql.extensions) or
  * `spark.experimental.extraOptimizations`.
  */
object SelfDotRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(l, r) if l.semanticEquals(r) => SelfDot(l)
    }
}
