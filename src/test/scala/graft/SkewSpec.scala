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

  test("AQE splits the skewed partition of a sort-merge join (skew=true in plan)") {
    // the runtime half of the skew posture: before reaching for salting,
    // AQE's OptimizeSkewedJoin splits oversized partitions of an SMJ.
    // Thresholds are lowered so the local fixture trips them; confs are
    // restored afterwards (the session is shared across suites).
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val pad = "x" * 64
      val big = (1 to 200000)
        .map(i => (if (i % 20 != 0) 0L else i.toLong, s"$pad$i"))
        .toDF("key", "payload")
      val small = (0 to 100).map(i => (i.toLong, i * 2L)).toDF("key", "w")
      val joined = big.join(small, "key")
      // collect() drives THIS Dataset's queryExecution (count()/write()
      // plan their own trees), so AQE finalizes the inspected plan; it
      // also gives the row-count sanity check
      assert(joined.collect().length === 190005)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split SMJ, got:\n${plan.linesIterator.take(25).mkString("\n")}")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
