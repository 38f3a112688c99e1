package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.start(cpus)
    // Warmup, timed separately: materialize every shared persisted relation
    // and touch each table once, so the timed loop measures per-query work —
    // not session/scan warmup or first-touch cache fills that would
    // otherwise land on whichever query sorts first (q01 absorbed ~7 s of
    // it in round 1). Reported as "warmup_sec" in the JSON.
    val w0 = System.nanoTime()
    // a broken warmup step must not abort the bench before the JSON line:
    // the timed loop below will surface the same breakage as -1 + failures
    var warmupFailures = 0
    def warm(f: => Long): Unit =
      try { f; () } catch { case e: Throwable =>
        warmupFailures += 1
        System.err.println(s"[bench] warmup step failed: ${e.getMessage}")
      }
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings").foreach(t =>
      warm(Tables.load(spark, sfDir, t).count()))
    warm(Tables.events(spark, sfDir).count())
    warm(operators.TokenPipeline.docTokenCounts(spark, sfDir).count())
    warm(operators.TokenPipeline.tokenDictionary(spark, sfDir).count())
    warm(operators.TokenPipeline.docAggregates(spark, sfDir).count())
    warm(operators.TextAnalysis.tfidfRaw(spark, sfDir).count())
    warm(operators.Dedup.shingles(spark, sfDir).count())
    warm(operators.Dedup.minhashSignatures(spark, sfDir).count())
    warm(operators.Dedup.simhashSignature(spark, sfDir, 16).count())
    warm(operators.Dedup.simhashSignature(spark, sfDir, 32).count())
    warm(operators.Dedup.simhashSignature(spark, sfDir, 64).count())
    warm(operators.Similarity.vectorIndex(spark, sfDir).count())
    // q73/q74 first-touch pre-fill (round 10): these two queries alone
    // carried 42 s of BENCH_r09's 163 s cold total — the BPE loop JITs
    // ~15 per-round window plans and SemDeDup JITs the embedding
    // hash/rep + sign-LSH + propagation plans on first run. One full run
    // each here moves that one-time codegen/cache fill into warmup_sec,
    // so the cold map measures them against a steady floor and cold
    // regressions elsewhere stop hiding behind their noise.
    warm(SparkEntry.queries("q73_bpe_merges")(spark, sfDir).count())
    warm(SparkEntry.queries("q74_semdedup_survivors")(spark, sfDir).count())
    // evict the result memos the pre-fill just created (BPE merges,
    // cluster labels): the timed cold pass must still do each query's
    // full per-query work, minus only the JIT/codegen warmup above
    Caches.clearResultMemos(spark)
    val warmup = (System.nanoTime() - w0) / 1e9
    // deterministic name order; a failed query reports -1 (not its wall
    // time) so breakage can never masquerade as a speedup; failure count is
    // surfaced in the JSON
    def onePass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    // STEADY-STATE protocol: run the whole suite `passes` times in ONE
    // session and report the LAST pass as the headline numbers. A single
    // cold pass conflates per-query work with JIT/codegen compilation and
    // first-touch cache fills, which made untouched queries drift up to
    // ~3× between rounds; the warm pass is reproducible run-to-run. The
    // cold pass is kept in "queries_cold" so the warm-vs-cold gap stays
    // observable.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt.max(1)
    // Locale-pinned so the decimal separator is always '.'
    def s3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val all = (1 to passes).map { i =>
      // later passes re-do real per-query work (cluster labels are a
      // memoized RESULT, not an index) but keep index-like caches warm
      if (i > 1) Caches.clearResultMemos(spark)
      onePass()
    }
    val cold = all.head
    val results = all.last
    val failures = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val coldTotal = cold.map(_._2).filter(_ >= 0).sum
    // The driver captures only the LAST 2000 chars of output (measured from
    // BENCH_r09's "tail" field) and parses the final {"metric":...} line.
    // Rounds 1-5 recorded parsed:null (maps ahead of the metric line pushed
    // it out of the window); rounds 8-9 then lost the HEAD of the cold map
    // (BENCH_r09 starts mid-q37) because 2-decimal maps + headline ≈ 2.6 KB
    // > 2000. Structural fix: per-query values are INTEGERS with the unit in
    // the map's key — warm (the declared metric) in centiseconds
    // ("bench_warm_pass_cs", 10 ms resolution), cold (diagnostic only) in
    // deciseconds ("bench_cold_pass_ds", 100 ms) — keys are the qNN prefix,
    // sorted name order. Measured against r09 values: cold ≈ 850 + warm
    // ≈ 950 + headline ≈ 160 < 1950, so BOTH complete maps and the headline
    // sit inside any 2000-char tail. A failed query stays visibly negative
    // (-1 s → -10/-100 ticks).
    def fmtShort(rs: Seq[(String, Double)], ticksPerSec: Int): String = {
      // qNN prefixes must be unique or the JSON object would silently
      // carry duplicate keys and drop a timing
      require(rs.map(_._1.takeWhile(_ != '_')).distinct.size == rs.size,
        "duplicate qNN prefix across query names — bench map would lose a timing")
      rs.map { case (k, v) =>
        "\"" + k.takeWhile(_ != '_') + "\":" + math.round(v * ticksPerSec) }
        .mkString("{", ",", "}")
    }
    println(s"""{"bench_cold_pass_ds":${fmtShort(cold, 10)}}""")
    println(s"""{"bench_warm_pass_cs":${fmtShort(results, 100)}}""")
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","failures":$failures,"warmup_sec":${s3(warmup)},"warmup_failures":$warmupFailures,"passes":$passes,"cold_total":${s3(coldTotal)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
