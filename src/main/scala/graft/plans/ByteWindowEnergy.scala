package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native codegen windowed byte-energy over a `binary` column: for
  * window width w, element k of the result is Σ (b−128)² over payload
  * bytes [k·w, min((k+1)·w, n)) — the PCM silence/energy gate (q94)
  * computed straight off the raw bytes.
  *
  * Why a custom Catalyst Expression (SURVEY §7.3 escape hatch, the
  * DotProduct/ShingleGenerator precedent): the composable form must
  * round-trip through `hex()` (2× the bytes as a string) and decode each
  * byte with `conv(substring(...))` inside higher-order-function lambdas
  * — and lambda bodies don't common-subexpression, so every reference
  * re-decodes. Measured at sf0.1 under the full-materialization bench:
  * 11.5 s inline (double decode), 37.8 s with a "decode once" array
  * column (CollapseProject inlined it back into every window lambda).
  * This expression reads the binary directly — no hex, no conv, one
  * tight integer loop in whole-stage codegen. Integer sums are
  * order-free, so results are bit-identical to the HOF form and the
  * DuckDB oracle (MultimodalSpec keeps the differential test).
  */
case class ByteWindowEnergy(child: Expression, window: Int)
    extends UnaryExpression {

  require(window > 0, "window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_byte_energy"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_byte_energy needs binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val data = input.asInstanceOf[Array[Byte]]
    val n = data.length
    val nw = (n + window - 1) / window
    val es = new Array[Long](nw)
    var i = 0
    while (i < n) {
      val b = (data(i) & 0xff) - 128L
      es(i / window) += b * b
      i += 1
    }
    ArrayData.toArrayData(es)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val nw = ctx.freshName("nw")
      val es = ctx.freshName("es")
      val b = ctx.freshName("b")
      s"""
         |int $n = $a.length;
         |int $nw = ($n + ${window - 1}) / $window;
         |long[] $es = new long[$nw];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $b = ($a[$i] & 0xFF) - 128L;
         |  $es[$i / $window] += $b * $b;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($es);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteWindowEnergy =
    copy(child = newChild)
}

object ByteWindowEnergy {
  def apply(payload: Column, window: Int): Column =
    GraftBridge.column(
      ByteWindowEnergy(GraftBridge.expression(payload), window))
}
