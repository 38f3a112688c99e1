package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals the unsalted join on a pathologically skewed key") {
    // 90% of the big side lands on one key — the shape AQE's skew join
    // handles only up to a point and salting is the escape hatch for
    val big = (1 to 2000)
      .map(i => (if (i % 10 != 0) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val small = Seq(("hot", 1L), ("k10", 2L), ("k20", 3L)).toDF("key", "w")
    val expected = big.join(small, "key")
    val got = Skew.saltedJoin(big, small, "key", 8)
    assert(got.count() === expected.count())
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("the deterministic salt spreads the hot key across buckets") {
    val big = (1 to 1000).map(i => ("hot", i.toLong)).toDF("key", "v")
    // mirror saltedJoin's salt (hash over the whole row, mod buckets): the
    // hot key's rows must land in most of the 8 buckets, and identically
    // on every run (no rand())
    def salts() = big
      .withColumn("s", pmod(hash(col("key"), col("v")), lit(8)))
      .select("s").distinct().as[Int].collect().toSet
    val first = salts()
    assert(first.size >= 6, s"hot key should spread over most buckets, got $first")
    assert(salts() === first, "salt must be deterministic across runs")
  }
}
