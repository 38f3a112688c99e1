package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-token shingle generator: one output row per window of k
  * consecutive tokens, "w1 w2 … wk" (UTF8 bytes joined directly — no
  * intermediate array-of-strings column, no per-window lambda dispatch).
  *
  * Custom Generator rationale (SURVEY §7.3 ladder): the composable form
  * `explode(transform(slice(sequence…)))` is semantically right but builds
  * an index array + k-element slice + concat per window through interpreted
  * higher-order lambdas; a Generator emits rows straight from the token
  * array. Same output contract as TextFns.shingleArray (differential test
  * in DedupSpec).
  */
case class ShingleGenerator(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Iterator.empty
    else {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n < k) Iterator.empty
      else {
        val toks = new Array[UTF8String](n)
        var i = 0
        while (i < n) { toks(i) = a.getUTF8String(i); i += 1 }
        val sep = UTF8String.fromString(" ")
        (0 to n - k).iterator.map { s =>
          val window = new Array[UTF8String](k)
          System.arraycopy(toks, s, window, 0, k)
          InternalRow(UTF8String.concatWs(sep, window: _*))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}

object ShingleGenerator {
  /** Generator column: `df.select(col("id"), shingles(tokens, 5).as("shingle"))`. */
  def shingles(tokens: Column, k: Int): Column =
    GraftBridge.column(ShingleGenerator(GraftBridge.expression(tokens), k))
}
