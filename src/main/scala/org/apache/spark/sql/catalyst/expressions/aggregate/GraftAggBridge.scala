package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Constructor access for CollectTopK, which is package-private to
  * catalyst — the same in-package bridge device as
  * org.apache.spark.sql.GraftBridge (Spark 4 locked these internals
  * down; extension libraries expose the one call they need from inside
  * the package).
  */
object GraftAggBridge {
  def collectTopK(child: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(child, num, reverse).toAggregateExpression()
}
