package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Membership of a LONG bit position in a fixed bit-set carried by the
  * expression itself — the Bloom-filter probe of the decontamination gates
  * (q102's streaming twin, q125's per-benchmark flags).
  *
  * Why a custom Catalyst Expression (SURVEY §7.3 escape hatch): the
  * serialized filter must ride the PLAN, not a join. Two composable forms
  * failed structurally, both measured in round 18:
  *  - `substr` over the 64 KiB hex-string literal: UTF8String.substring is
  *    a linear byte scan, and ~80 such scans per shingle made q125 the most
  *    expensive query in the suite (24.7 s warm at sf0.1);
  *  - `element_at` over a 2^18-element array literal: O(1) per probe, but
  *    Spark stringifies every literal into each plan node it appears in
  *    (UI descriptions, explain, canonicalization) and ~80 references ×
  *    262,144 rendered elements OOMed an 8 GB driver during planning.
  * This expression stores the set as 4,096 UNBOXED longs shipped once per
  * task via `ctx.addReferenceObj`, probes with one index + shift inside
  * whole-stage codegen, and renders as a constant-size tag — the payload
  * never prints.
  *
  * Bit layout: bit p lives at word p >> 6, bit p & 63 — built by
  * Sketches.hexBitWords from the packBitsHex serialization (the layout
  * SketchesSpec pins). Equality is by array REFERENCE (plus tag), which is
  * sound here: each benchmark's word array is built once and shared by its
  * k probes, so common-subexpression elimination still sees identical
  * children, while two genuinely different sets never compare equal.
  */
case class BitSetContains(child: Expression, bits: Array[Long], tag: String)
    extends UnaryExpression {

  // callers (Sketches / StreamingOps) always build the position as LONG
  // (the bloomPositionOf definition); enforced rather than coerced
  require(bits.length == graft.operators.Sketches.BloomBits / 64,
    s"bit-set must be ${graft.operators.Sketches.BloomBits / 64} words")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bitset_contains expects a LONG position, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bitset_contains"

  override def nullSafeEval(p: Any): Any = {
    val i = p.asInstanceOf[Long]
    ((bits((i >>> 6).toInt) >>> (i & 63L).toInt) & 1L) == 1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => {
      val ref = ctx.addReferenceObj("graftBits", bits, "long[]")
      s"${ev.value} = ((($ref[(int)($p >>> 6)] >>> (int)($p & 63L)) & 1L) == 1L);"
    })

  // compact rendering everywhere a plan is stringified — the payload must
  // never print (see the scaladoc's OOM note)
  override def toString: String = s"graft_bitset_contains($tag, $child)"
  override def sql: String = s"graft_bitset_contains('$tag', ${child.sql})"

  override protected def withNewChildInternal(newChild: Expression): BitSetContains =
    copy(child = newChild)
}

object BitSetContains {
  def apply(pos: Column, bits: Array[Long], tag: String): Column =
    GraftBridge.column(BitSetContains(GraftBridge.expression(pos), bits, tag))
}
