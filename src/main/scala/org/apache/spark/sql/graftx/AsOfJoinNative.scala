package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join: the full custom-operator ladder (SURVEY §7.3 (c)) —
  * LogicalPlan node + SparkStrategy + physical SparkPlan — for the operator
  * Spark's built-ins lack. Complements operators.AsOfJoin (the composed
  * union+window form): identical semantics, but the physical operator
  * declares `ClusteredDistribution` + per-key (ts) ordering so Spark plans
  * ONE shuffle + sort per side and the merge itself is a streaming
  * per-partition pass holding one right row — no window-state machinery,
  * no union blow-up of mixed schemas.
  *
  * Lives under org.apache.spark.sql (like other Spark extension libraries)
  * because execution internals are private[sql]. Keys and timestamps are
  * LongType (documented; the facade enforces it).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Both sides cluster on the key and arrive sorted by (key, ts): Spark
  // inserts exactly one Exchange + Sort per side, same shape as SMJ.
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      // current best right row for the key being merged
      var curKey = 0L
      var haveMatch = false
      var matchRow: InternalRow = null
      // NULL keys/timestamps never match (SQL equality semantics; the
      // composed union+window form behaves the same). Nulls-first ordering
      // puts them at the head of each side: left nulls emit nullRight,
      // right nulls are drained unmatched.
      def isNullAt(e: org.apache.spark.sql.catalyst.expressions.Expression,
          row: InternalRow): Boolean = e.eval(row) == null
      lIter.map { lRow =>
        if (isNullAt(lk, lRow) || isNullAt(lt, lRow)) {
          resultProj(joined(lRow, nullRight))
        } else {
          val k = lk.eval(lRow).asInstanceOf[Long]
          val t = lt.eval(lRow).asInstanceOf[Long]
          if (haveMatch && curKey != k) { haveMatch = false; matchRow = null }
          // advance right while its (key, ts) <= (k, t)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            if (isNullAt(rk, head) || isNullAt(rt, head)) { rBuf.next() }
            else {
              val hk = rk.eval(head).asInstanceOf[Long]
              if (hk < k || (hk == k && rt.eval(head).asInstanceOf[Long] <= t)) {
                if (hk == k) {
                  matchRow = head.copy() // iterator reuses row buffers
                  haveMatch = true
                  curKey = k
                }
                rBuf.next()
              } else advancing = false
            }
          }
          val out =
            if (haveMatch && curKey == k) joined(lRow, matchRow)
            else joined(lRow, nullRight)
          resultProj(out)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNative {

  /** As-of join `left` to the most recent `right` row (rightTs ≤ leftTs,
    * same key). Right columns come back prefixed `r_`; unmatched rows get
    * nulls. Key/ts columns must be LongType.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    // fresh aliases give the right side new expression ids (self-join safe)
    // and the r_ prefix keeps output names disjoint
    val r = right.select(right.columns.map(c =>
      right.col(c).as(s"r_$c")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    val (lkA, ltA) = (attr(lPlan, key), attr(lPlan, leftTs))
    val (rkA, rtA) = (attr(rPlan, s"r_$key"), attr(rPlan, s"r_$rightTs"))
    require(Seq(lkA, ltA, rkA, rtA).forall(_.dataType == LongType),
      "asofJoin requires LongType key and timestamp columns")
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      AsOfJoinPlan(lPlan, rPlan, lkA, rkA, ltA, rtA))
  }
}
