package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — an operator Spark's built-ins lack directly (SURVEY §7.3
  * preference (a): compose existing ops before writing a custom SparkPlan).
  *
  * For every left row, attach the single right row with the greatest
  * rightTs ≤ leftTs under the same key (ties on the right must be
  * pre-deduplicated to one row per (key, ts)).
  *
  * Implementation: tag both sides, union, ONE shuffle on the key, sort
  * within partitions by (ts, side) — right rows sort before left rows at
  * equal ts so `ts ≥` semantics hold — then a running `last(right_struct,
  * ignoreNulls)` window carries the most recent right row forward into each
  * left row. Cost is a single sort-shuffle of |L|+|R|: no range-join
  * explosion, no per-key collect, skew-safe under AQE like any window.
  */
object AsOfJoin {

  /** Left rows + an `asof` struct column holding the matched right row
    * (null when no right row precedes the left row).
    */
  def asofJoin(left: DataFrame, rightRaw: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    // NULL keys/timestamps never match (SQL equality semantics, same as the
    // native AsOfJoinExec): drop them from the right side — otherwise
    // nulls-first ordering would make a NULL-ts right row act like -infinity
    // and match everything in its key group. Left rows with NULL key/ts
    // naturally get no match (their partition holds no right rows / nothing
    // sorts at-or-before them).
    val right = rightRaw.filter(col(key).isNotNull && col(rightTs).isNotNull)
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields)
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(lStruct).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    val w = Window.partitionBy("__k").orderBy("__t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: Seq(col("__asof").as("asof")): _*)
  }
}
