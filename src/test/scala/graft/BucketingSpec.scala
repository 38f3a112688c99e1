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
}
