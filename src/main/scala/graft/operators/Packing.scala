package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Context-window packing — the batch-forming step of LLM pretraining
  * (extension surface; the reference is strictly an ETL binary): documents
  * are concatenated in a deterministic corpus order (doc_id) and the token
  * stream is cut into fixed-capacity context windows — the
  * "concatenate and chunk" regime GPT-style pipelines use to waste no
  * sequence budget on padding. The per-doc placement relation (start
  * offset, first/last window, windows spanned) is exactly the map a data
  * loader needs to locate any document inside the packed stream, and the
  * boundary-crossing flag prices the attention-mask fragmentation the
  * packing introduces.
  *
  * Scale shape: everything rides a distributed EXCLUSIVE prefix sum over
  * the per-doc token counts — the same two-job idiom as [[graft.operators.Ids]]
  * (range-partitioned total sort, one tiny driver-side pass over
  * per-partition subtotals, offsets broadcast back) — so no window
  * function ever funnels the corpus through one partition. The count
  * relation is ~16 bytes/doc regardless of document size: at 100 TB of
  * text it is the token COUNTS, never the tokens, that move through the
  * sort.
  */
object Packing {

  /** Training context length (tokens per window). */
  val ContextTokens = 2048L

  /** Append an exclusive running total of `valCol` (the sum over all
    * earlier rows in `orderCols` order) as `out`.
    *
    * `sum(...).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * -1))` is the correct one-liner but executes as ONE partition — a
    * non-starter at scale (the q05 running spend is fine because it
    * partitions by customer; a GLOBAL running total has no partition
    * key). The scale-safe idiom, mirroring Ids.withDenseId: total sort
    * (range-partitioned, stays distributed), one pass collecting the
    * per-partition subtotals (#partitions values — bounded driver
    * traffic), then a per-partition running sum seeded by the broadcast
    * offsets. `orderCols` must be a total order for deterministic
    * results; both jobs re-derive the same range partitioning from the
    * same input (the zipWithIndex determinism argument, round 2).
    */
  def withExclusivePrefixSum(df: DataFrame, valCol: String, out: String,
      orderCols: Column*): DataFrame = {
    val sorted = df.orderBy(orderCols: _*)
    val vi = sorted.schema.fieldIndex(valCol)
    require(sorted.schema(vi).dataType == LongType,
      s"$valCol must be LONG (got ${sorted.schema(vi).dataType})")
    val rdd0 = sorted.rdd
    val partTotals = rdd0.mapPartitionsWithIndex { case (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(vi)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rows = rdd0.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val row = Row.fromSeq(r.toSeq :+ acc); acc += r.getLong(vi); row
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** q120: per-document placement in the packed token stream. For a doc
    * with no tokens, first_win = last_win = the window its offset falls
    * in and n_windows = 0 (it occupies nothing). Invariants pinned by
    * PackingSpec: start_tok is the exclusive running total in doc_id
    * order; consecutive docs abut exactly; a doc spans
    * ceil((start%C + n)/C) windows.
    */
  def contextPacking(spark: SparkSession, dir: String,
      capacity: Long = ContextTokens): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val counts = TextAnalysis.rawTokens(spark, dir)
      .select(col("doc_id"),
        coalesce(size(col("toks")), lit(0)).cast("long").as("n_toks"))
    val placed = withExclusivePrefixSum(counts, "n_toks", "start_tok",
      col("doc_id"))
    placed
      .select(col("doc_id"), col("n_toks"), col("start_tok"),
        expr(s"start_tok div $capacity").as("first_win"),
        when(col("n_toks") > lit(0L),
          expr(s"(start_tok + n_toks - 1) div $capacity"))
          .otherwise(expr(s"start_tok div $capacity")).as("last_win"))
      .withColumn("n_windows",
        when(col("n_toks") > lit(0L),
          col("last_win") - col("first_win") + lit(1L)).otherwise(lit(0L)))
      .orderBy("doc_id")
  }
}
