package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (Aggregator) coverage: per-group top-k by quantity with a
  * bounded buffer — the partial/final-combinable alternative to ranking
  * windows. A window sorts every group's full row set; this aggregator
  * carries at most k rows per group through the map-side partial, the
  * shuffle, and the final merge, which is the shape that survives groups
  * with millions of members at 100 TB.
  *
  * Ordering contract: qty descending, doc_id ascending tie-break —
  * identical to `ROW_NUMBER() OVER (ORDER BY qty DESC, doc_id)`, so the
  * DuckDB oracle can mirror it exactly.
  */
object TopKAggregator {

  case class DocQty(doc_id: Long, qty: Long)

  private val ord: Ordering[DocQty] = Ordering.by(d => (-d.qty, d.doc_id))

  class TopKByQty(k: Int) extends Aggregator[DocQty, Seq[DocQty], Seq[DocQty]] {
    override def zero: Seq[DocQty] = Nil
    override def reduce(buf: Seq[DocQty], a: DocQty): Seq[DocQty] =
      merge(buf, Seq(a))
    override def merge(b1: Seq[DocQty], b2: Seq[DocQty]): Seq[DocQty] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(r: Seq[DocQty]): Seq[DocQty] = r.sorted(ord)
    override def bufferEncoder: Encoder[Seq[DocQty]] =
      Encoders.kryo[Seq[DocQty]]
    override def outputEncoder: Encoder[Seq[DocQty]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column-API handle: `groupBy(...).agg(topKByQty(3)($"doc_id", $"qty"))`. */
  def topKByQty(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByQty(k), Encoders.product[DocQty])

  case class TokScore(token: String, tfidf: Double)

  private val scoreOrd: Ordering[TokScore] = Ordering.by(t => (-t.tfidf, t.token))

  /** Same bounded-buffer shape keyed by (score desc, token asc) — the
    * ranking contract of `ROW_NUMBER() OVER (ORDER BY tfidf DESC, token)`,
    * so per-doc top terms (q43) drop the full-relation sort of a window:
    * only k rows per doc cross the shuffle.
    */
  class TopKByScore(k: Int) extends Aggregator[TokScore, Seq[TokScore], Seq[TokScore]] {
    override def zero: Seq[TokScore] = Nil
    override def reduce(buf: Seq[TokScore], a: TokScore): Seq[TokScore] =
      merge(buf, Seq(a))
    override def merge(b1: Seq[TokScore], b2: Seq[TokScore]): Seq[TokScore] =
      (b1 ++ b2).sorted(scoreOrd).take(k)
    override def finish(r: Seq[TokScore]): Seq[TokScore] = r.sorted(scoreOrd)
    override def bufferEncoder: Encoder[Seq[TokScore]] =
      Encoders.kryo[Seq[TokScore]]
    override def outputEncoder: Encoder[Seq[TokScore]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def topKByScore(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByScore(k), Encoders.product[TokScore])

  case class VecDist(vec_id: Long, dist: Double)

  private val distOrd: Ordering[VecDist] = Ordering.by(v => (v.dist, v.vec_id))

  /** Bounded min-k by (dist asc, vec_id asc) — the ranking contract of
    * `ROW_NUMBER() OVER (ORDER BY dist, vec_id)` kept to k rows per group
    * through partial, shuffle, and merge. Used by prototype selection
    * (q97): a cluster with millions of members still ships only k rows.
    */
  class MinKByDist(k: Int) extends Aggregator[VecDist, Seq[VecDist], Seq[VecDist]] {
    override def zero: Seq[VecDist] = Nil
    override def reduce(buf: Seq[VecDist], a: VecDist): Seq[VecDist] =
      merge(buf, Seq(a))
    override def merge(b1: Seq[VecDist], b2: Seq[VecDist]): Seq[VecDist] =
      (b1 ++ b2).sorted(distOrd).take(k)
    override def finish(r: Seq[VecDist]): Seq[VecDist] = r.sorted(distOrd)
    override def bufferEncoder: Encoder[Seq[VecDist]] =
      Encoders.kryo[Seq[VecDist]]
    override def outputEncoder: Encoder[Seq[VecDist]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def minKByDist(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinKByDist(k), Encoders.product[VecDist])
}
