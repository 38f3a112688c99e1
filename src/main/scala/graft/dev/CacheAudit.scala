package graft.dev

import org.apache.spark.sql.SparkSession

/** Storage-footprint audit of every persisted relation the library keeps
  * per (session, dir) — the round-6 cache-budget check. For each cache-
  * building query, materializes it and prints the storage DELTA (new
  * cached RDDs and their memory/disk bytes), so each relation's cost is
  * attributed. Results go in BASELINE-notes.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.dev.CacheAudit
  */
object CacheAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = graft.Sessions.start(cpus)
    import graft.operators._

    var seen = Set.empty[Int]
    var totalMem = 0L
    var totalDisk = 0L
    def step(label: String)(f: => Long): Unit = {
      f
      val infos = spark.sparkContext.getRDDStorageInfo.filterNot(i => seen(i.id))
      seen ++= infos.map(_.id)
      val mem = infos.map(_.memSize).sum
      val disk = infos.map(_.diskSize).sum
      totalMem += mem; totalDisk += disk
      println(f"CACHEAUDIT $label%-28s mem=${mem / 1024}%8d KiB disk=${disk / 1024}%6d KiB rdds=${infos.length}")
    }

    step("docTokenCounts (hub)")(TokenPipeline.docTokenCounts(spark, sfDir).count())
    step("tokenDictionary")(TokenPipeline.tokenDictionary(spark, sfDir).count())
    step("shingles")(Dedup.shingles(spark, sfDir).count())
    step("minhashSignatures")(Dedup.minhashSignatures(spark, sfDir).count())
    step("fingerprints (via q21)")(Dedup.exactDedup(spark, sfDir).count())
    step("reps+capped (via q23)")(Dedup.minhashNearDups(spark, sfDir).count())
    step("clusterLabels (via q52)")(Dedup.dupClusters(spark, sfDir).count())
    step("srcTokens (via q63)")(TextAnalysis.sourceOverlap(spark, sfDir).count())
    step("rawTokens (via q70)")(TextAnalysis.collocations(spark, sfDir).count())
    println(f"CACHEAUDIT TOTAL mem=${totalMem / 1024} KiB disk=${totalDisk / 1024} KiB " +
      f"(storage pool ≈ ${spark.sparkContext.getExecutorMemoryStatus.values.map(_._1).sum / 1024 / 1024} MiB)")
    spark.stop()
  }
}
