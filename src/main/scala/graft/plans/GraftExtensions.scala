package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's custom Catalyst expressions as SQL functions.
  *
  * Two paths:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` (cluster config /
  *    spark-submit) — the standard SparkSessionExtensions hook;
  *  - `GraftExtensions.register(spark)` — imperative registration on an
  *    already-running session (tests, notebooks).
  *
  * After either, `SELECT graft_dot(a, b)` works from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotFunction)
    e.injectOptimizerRule(_ => SelfDotRule)
  }
}

object GraftExtensions {

  private def builder(exprs: Seq[Expression]): Expression =
    DotProduct(exprs(0), exprs(1))

  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
    builder _)

  /** Imperative registration on a live session: the SQL function plus the
    * self-dot optimizer rule (extraOptimizations is the live-session twin
    * of injectOptimizerRule).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", builder _, "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(SelfDotRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SelfDotRule
    }
  }
}
