package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale posture evidence (SURVEY §7.5 #6): pre-bucketing both sides of a
  * recurring join key removes the shuffle entirely — the sort-merge join
  * reads co-located buckets. At 100 TB the bucket count becomes the unit
  * of parallelism and re-partitioning cost drops to zero for every
  * downstream join on the key.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    val orders = Tables.orders(spark, TestSpark.Sf)
      .withColumnRenamed("o_custkey", "custkey")
    val customer = Tables.customer(spark, TestSpark.Sf)
      .withColumnRenamed("c_custkey", "custkey")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    spark.sql("DROP TABLE IF EXISTS c_bkt")
    orders.write.bucketBy(8, "custkey").sortBy("custkey")
      .option("path", s"$tmp/o").saveAsTable("o_bkt")
    customer.write.bucketBy(8, "custkey").sortBy("custkey")
      .option("path", s"$tmp/c").saveAsTable("c_bkt")

    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("o_bkt").join(spark.table("c_bkt"), "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
      assert(joined.count() ===
        orders.join(customer, "custkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.sql("DROP TABLE IF EXISTS o_bkt")
      spark.sql("DROP TABLE IF EXISTS c_bkt")
    }
  }

  test("bucketed IVF index: a probe reads one bucket, matches unbucketed scan") {
    import spark.implicits._
    import graft.operators.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    spark.sql("DROP TABLE IF EXISTS ivf_idx")
    val autoBefore = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      // the auto rule turns OFF bucketed scans when no join/agg needs the
      // distribution — but here the point IS bucket-filter pruning, so pin it
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      Similarity.buildIvfIndex(spark, TestSpark.Sf, "ivf_idx", s"$tmp/ivf",
        bits = 6, buckets = 8)
      // a real query vector from the corpus
      val q = Tables.embeddings(spark, TestSpark.Sf)
        .filter($"vec_id" === 3L).select($"embedding".cast("array<double>"))
        .as[Seq[Double]].head()
      val probe = Similarity.probeIvf(spark, "ivf_idx", q, k = 5)
      // bucket pruning proven in the plan: only 1 of 8 buckets scanned
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket-pruned scan, got:\n$plan")
      // same answer as the unbucketed cell scan (minus the query row itself,
      // which probeIvf deliberately keeps: it IS a member of its own cell)
      val cell = Similarity.signBucketOf(q, 6)
      val expected = spark.table("ivf_idx").filter($"bucket" === cell).count()
      assert(probe.count() === math.min(5, expected))
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", autoBefore)
      spark.sql("DROP TABLE IF EXISTS ivf_idx")
    }
  }
}
