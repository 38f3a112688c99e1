package graft.dev

import scala.jdk.CollectionConverters._

/** Cache-residency A/B for the r11 warm-inflation family (VERDICT r11,
  * "What's wrong" #2): 11 short events/relational queries sat 2–5.7× their
  * r9 driver-warm and showed warm>cold inversion in the same bench run.
  * Hypothesis to test: the r11-enlarged resident index-artifact set
  * (simhash sigs ×3 widths, embedding base, doc aggregates, tf-idf, stats
  * — all MEMORY_AND_DISK) raises GC/block-manager pressure during the warm
  * pass and taxes exactly the short untouched queries.
  *
  *   sbt -batch "runMain graft.dev.ResidencyProbe"
  *
  * Protocol: exact Bench environment (Sessions.start local[32]); ONE full
  * suite pass to fill every cache and JIT every plan (the warm pass's real
  * starting state); then 3 timed family passes with the index caches
  * RESIDENT (clearResultMemos only — Bench's steady protocol), then 3
  * timed family passes with EVERY cache evicted before each pass
  * (Caches.clear + System.gc). The family queries are events/relational
  * and touch no graft cache (q29 touches the vector index and is listed
  * last so its refill cost is visible and separable), so A−B isolates the
  * residency/GC tax. Per query: wall seconds + JVM GC-time delta (ms).
  */
object ResidencyProbe {
  val Family: Seq[String] = Seq(
    "q30_label_stats", "q32_token_counts", "q35_hourly_events",
    "q36_sessions", "q37_json_stats", "q41_asof_last_purchase",
    "q42_cube_summary", "q45_orders_pivot", "q46_price_quantiles",
    "q69_value_median", "q29_knn_ivf")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.start(cpus)
    val fam = (if (args.nonEmpty) args.toSeq else Family)
      .map(n => n -> graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'")))

    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def cachedMB: Long =
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / (1 << 20)

    // full-suite fill: every cache resident, every plan JIT'd — the state
    // the driver's warm pass actually starts from
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try { fn(spark, sfDir).count(); () }
      catch { case e: Throwable =>
        System.err.println(s"[resprobe] fill $n failed: ${e.getMessage}") }
    }

    def pass(label: String, evict: Boolean): Unit = {
      if (evict) { graft.Caches.clear(spark); System.gc() }
      graft.Caches.clearResultMemos(spark)
      println(s"RESPROBE pass=$label cachedMB=$cachedMB")
      fam.foreach { case (name, fn) =>
        val g0 = gcMs; val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"RESPROBE $label $name $dt%.3f s gc=${gcMs - g0} ms rows=$n")
      }
    }
    (1 to 3).foreach(i => pass(s"resident$i", evict = false))
    (1 to 3).foreach(i => pass(s"evicted$i", evict = true))
    // re-fill and re-run one resident pass LAST so block-order drift
    // (resident measured early, evicted late) can't masquerade as signal
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
    }
    pass("resident4", evict = false)
    spark.stop()
  }
}
