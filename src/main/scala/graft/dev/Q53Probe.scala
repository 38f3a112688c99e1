package graft.dev

import org.apache.spark.sql.SparkSession

/** Round-8 adjudication probe for q53_simhash_hamming (BENCH_r07 recorded
  * 4.97 s driver-warm vs 1.84 s in BENCH_r06 on byte-identical binaries).
  *
  * q53 is the suite's largest candidate join: 32-bit SimHash signatures
  * saturate on this low-entropy corpus (Dedup.scala scaladoc), so the
  * 4-band equi-join self-joins wide buckets and the popcount filter scans
  * millions of candidates for a 471-row output. The hypotheses are
  * (a) plain host contention starving the CPU-bound popcount pass, vs
  * (b) a repo-side regression à la round 6's q43 ObjectHash fallback.
  *
  * Protocol (the Q43Probe method): warm the token hub exactly as Bench
  * does, then time q53 over 3 passes in one session and dump the
  * persisted-storage footprint. A steady local-warm time at or under the
  * BENCH_r06 value on an idle host adjudicates the driver-warm outlier as
  * contention drift; a reproduced multi-second local-warm time means a
  * real plan problem.
  */
object Q53Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = graft.Sessions.start(cpus)
    graft.operators.TokenPipeline.docTokenCounts(spark, sfDir).count()

    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.simhashNearDups(spark, sfDir).count()
      println(f"Q53PROBE pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }

    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      println(s"Q53PROBE storage rdd=${i.id} mem=${i.memSize} disk=${i.diskSize} " +
        s"parts=${i.numCachedPartitions}/${i.numPartitions} name=${i.name.take(100)}")
    }
    spark.stop()
  }
}
