package graft.dev

import org.apache.spark.sql.SparkSession

/** Round-6 adjudication probe for q43_top_terms (BENCH_r05 recorded 5.04 s
  * driver-warm vs 1.66 s local-warm on an untouched lineage).
  *
  * Hypothesis under test: ObjectHashAggregate's sort-based fallback.
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` defaults to
  * 128 in-memory groups; q43's partial aggregate groups by doc_id (~50k
  * groups at sf0.1, ~1.5k per partition at 32 partitions), so every
  * partition exceeds the threshold, destructs the hash map, and finishes
  * sort-based — i.e. the "bounded top-k with no buried sort" plan still
  * sorts the full tfidf relation per partition, with kryo-serialized
  * buffers. A contended host amplifies exactly that spill/sort path.
  *
  * Protocol: warm the token hub, then time topTerms N times at the default
  * threshold and N times with the threshold raised above the group count.
  */
object Q43Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // deliberately NOT Sessions.start: the probe measures the default
    // threshold against the raised one, so it builds a vanilla session
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    graft.operators.TokenPipeline.docTokenCounts(spark, sfDir).count()

    def time(tag: String): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.TextAnalysis.topTerms(spark, sfDir).count()
      println(f"Q43PROBE $tag pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    println(s"Q43PROBE threshold=default(128)")
    time("default")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
    println(s"Q43PROBE threshold=4000000")
    time("raised")

    // storage footprint of everything persisted right now (cache audit)
    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      println(s"Q43PROBE storage rdd=${i.id} mem=${i.memSize} disk=${i.diskSize} " +
        s"parts=${i.numCachedPartitions}/${i.numPartitions} name=${i.name.take(100)}")
    }
    spark.stop()
  }
}
