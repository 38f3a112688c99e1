package graft.dev

import org.apache.spark.sql.SparkSession

/** Round-9 adjudication probe for q64_label_outliers (BENCH_r08 recorded
  * 2.19 s driver-warm vs 0.81 s in BENCH_r07 on unchanged code — the
  * round-8 verdict graded it `weak` pending the Q43Probe 3-pass method).
  *
  * Protocol (Q43Probe's): vanilla local session, one warm-up pass, then
  * 3 timed passes of labelOutliers at sf0.1. A local-warm ≤ 1 s closes
  * the grade as host-contention drift; anything slower is a real
  * regression to root-cause.
  */
object Q64Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    graft.operators.Similarity.labelOutliers(spark, sfDir).count() // warm-up
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.Similarity.labelOutliers(spark, sfDir).count()
      println(f"Q64PROBE pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
