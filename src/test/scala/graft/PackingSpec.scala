package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** The distributed prefix sum must equal the one-partition window it
  * replaces, and the packing geometry must be internally consistent —
  * the per-value guarantees the DuckDB oracle (q120) then pins per-row.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.Sf

  test("withExclusivePrefixSum equals the sequential scan across partitions") {
    // many partitions + skewed values so per-partition offsets matter;
    // keys deliberately NOT in partition order before the sort
    val vals = (0 until 997).map(i => ((i * 31) % 997).toLong -> (i % 13).toLong)
    val df = spark.createDataFrame(vals).toDF("k", "v").repartition(17)
    val got = Packing.withExclusivePrefixSum(df, "v", "run", col("k"))
      .select("k", "v", "run").as[(Long, Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    vals.sortBy(_._1).zip(got).foreach { case ((k, v), (gk, gv, grun)) =>
      assert(gk === k && gv === v)
      assert(grun === acc, s"k=$k")
      acc += v
    }
  }

  test("prefix sum rejects non-long value columns") {
    val df = Seq((1, 2)).toDF("k", "v") // ints
    intercept[IllegalArgumentException] {
      Packing.withExclusivePrefixSum(df, "v", "run", col("k"))
    }
  }

  test("packing geometry: docs abut exactly and window spans are minimal") {
    val cap = Packing.ContextTokens
    val rows = Packing.contextPacking(spark, sf)
      .select("doc_id", "n_toks", "start_tok", "first_win", "last_win",
        "n_windows")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // doc_id-ordered, exclusive: each doc starts where the previous ended
    var expectStart = 0L
    rows.foreach { case (id, n, start, fw, lw, nw) =>
      assert(start === expectStart, s"doc $id")
      expectStart += n
      assert(fw === start / cap)
      if (n > 0) {
        assert(lw === (start + n - 1) / cap)
        // spans = ceil((start%cap + n) / cap)
        assert(nw === (start % cap + n + cap - 1) / cap)
        assert(nw === lw - fw + 1)
      } else {
        assert(lw === fw && nw === 0L)
      }
    }
    // the packed stream is dense: total windows touched = ceil(total/cap)
    val total = rows.map(_._2).sum
    assert(rows.filter(_._2 > 0).map(_._5).max === (total - 1) / cap)
  }
}
