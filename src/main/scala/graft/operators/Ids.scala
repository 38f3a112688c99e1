package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global dense sequential IDs (reference main.go:137–141 assigns row ids by
  * url order; main.go:151–153 assigns token ids by sort order).
  *
  * `row_number().over(Window.orderBy(...))` is correct but funnels the whole
  * dataset through ONE partition — a non-starter at 100 TB. The scale-safe
  * idiom: total sort (range-partitioned, stays distributed), then
  * `zipWithIndex`, which computes per-partition offsets with one tiny
  * driver-side pass over partition sizes. Output ids are identical to
  * `row_number() - 1` whenever the sort key is a total order.
  */
object Ids {

  /** Append a 0-based dense id column assigned in `orderCols` order.
    * `orderCols` must be a total order (unique) for deterministic ids.
    */
  def withDenseId(df: DataFrame, idCol: String, orderCols: Column*): DataFrame = {
    val sorted = df.orderBy(orderCols: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
