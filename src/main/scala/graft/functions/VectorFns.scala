package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as pure
  * higher-order Catalyst expressions (no UDFs).
  *
  * Determinism contract: inputs are cast to `array<double>` (float→double
  * is exact) and every reduction is a strictly sequential left fold
  * (`aggregate` starts at 0.0; adding 0.0 is an IEEE no-op), so any engine
  * folding the same elements left-to-right — e.g. DuckDB's `list_reduce` —
  * produces bit-identical doubles. That is what lets cosine scores be
  * oracle-checked exactly.
  */
object VectorFns {

  /** Cast to array<double> (exact widening from float). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential dot product of two equal-length double arrays: a native
    * codegen Expression (see plans.DotProduct — the interpreted HOF
    * equivalent `aggregate(zip_with(a,b,_*_),0.0,_+_)` reduces in the same
    * order but ~20× slower).
    */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct(a, b)

  /** The HOF formulation, kept for differential testing of DotProduct. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (the reference precomputes
    * EuclidianNorm for exactly this, main.go:62).
    */
  def cosine(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** LSH-style sign bucket over the first `bits` components: bit i set iff
    * component i+1 > 0. A deterministic coarse quantizer for IVF-style
    * search and near-dup candidate generation.
    */
  def signBucket(a: Column, bits: Int): Column =
    (0 until bits).map(i => when(element_at(a, i + 1) > 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)
}
