package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Fixed-size sketch operators — the primitives a 100 TB training-data
  * pipeline uses when the exact relational form (a shuffle keyed on the
  * full value universe) stops being affordable:
  *
  *  - Bloom-filter decontamination (`bloomDecontamination`): membership of
  *    train-side n-grams in the eval split tested against a BOUNDED bit-set
  *    relation — the broadcast side is capped at `BloomBits` rows no matter
  *    how large the eval corpus grows, where q59's exact form shuffles
  *    train shingles against eval shingles. This is how public pretraining
  *    pipelines decontaminate at scale (a bitset per eval benchmark,
  *    broadcast to every worker); Spark itself uses the same shape for its
  *    runtime bloom-filter join pruning.
  *  - Count-min-sketch heavy hitters (`cmsHeavyHitters`): token frequency
  *    estimates from a d×w counter grid (Cormode–Muthukrishnan). The grid
  *    is `CmsDepth·CmsWidth` cells TOTAL — mergeable across partitions by
  *    cell-wise sum (here: one partial-aggregated groupBy on (i, bucket)),
  *    so the sketch state is constant-size while the token universe is
  *    unbounded. Estimates are min-over-rows and can only over-count.
  *  - HyperLogLog registers (`hllRegisters`): per-source distinct-shingle
  *    registers (Flajolet et al.) — bucket from md5 bits, register =
  *    max rank-of-first-one-bit — mergeable by cell-wise MAX, demonstrated
  *    by the `__all__` row-group which merges the per-source registers
  *    relationally. Spark's own `approx_count_distinct` is the same
  *    structure; this form keeps the registers as DATA (queryable,
  *    unionable across corpus dumps) instead of an opaque aggregate, and
  *    stays deterministic for the DuckDB oracle.
  *
  * Every hash is md5 over an explicit string (the repo-wide determinism
  * rule), prefix nibbles converted big-endian — `conv(substring(md5(x),
  * start, n), 16, 10)` here, the equivalent strpos-nibble chain in the
  * oracle SQL. All three operators are single-shuffle aggregates over the
  * already-persisted shingle/token-hub relations plus a broadcast of the
  * fixed-size sketch itself.
  */
object Sketches {

  /** Bloom hash functions (k) and bit-array size (m). m = 2^18 keeps the
    * bit-set relation ≤ 262,144 rows — a few MB broadcast — while holding
    * the false-positive rate ≈ (1−e^(−kn/m))^k ≈ 0.24% at n = 10k eval
    * shingles; at 100 TB you size m to the eval benchmark (it is the EVAL
    * side that bounds n, and eval benchmarks don't grow with the corpus).
    */
  val BloomK = 4
  val BloomBits = 1 << 18

  /** Per-benchmark Bloom sizing (r19, verdict r18 item 2): one global m
    * wastes memory on small benchmarks and saturates on big ones, so each
    * benchmark's filter is sized from ITS distinct-shingle count n on a
    * power-of-two ladder — the smallest rung ≥ BloomSizeFactor·n, clamped
    * to [BloomMinBits, BloomMaxBits]. Factor 16 holds the FP rate at
    * m = 16n: (1 − e^(−kn/m))^k = (1 − e^(−1/4))^4 ≈ 0.24% for k = 4 —
    * the same target the global 2^18 filter was documented at for its
    * design n. The ladder TOPS OUT at 2^24 because every position
    * derives from a 24-bit md5 value ([[bloomRawPositionOf]]): all rungs
    * divide 2^24, so `raw mod m` stays exactly uniform, and a saturated
    * benchmark (16n > 2^18) now gets the headroom the global filter
    * could not give it. 2^24 (r20, verdict r19 item 3 — raised from
    * 2^20, where a benchmark past 65,536 distinct shingles silently ran
    * above the 0.24% FP design point): k·6 = 24 of the 32 md5 nibbles,
    * ranges still disjoint, and the ceiling now binds only past ~1M
    * distinct eval shingles per benchmark — an order of magnitude above
    * any published eval suite. The oracle SQL interpolates the same
    * rungs.
    */
  val BloomMinBits = 1 << 12
  val BloomMaxBits = 1 << 24
  val BloomSizeFactor = 16L

  /** The ladder: smallest power-of-two in [BloomMinBits, BloomMaxBits]
    * with m ≥ BloomSizeFactor·n (clamped at the top).
    */
  def sizedBloomBits(nShingles: Long): Int = {
    var m = BloomMinBits
    while (m < BloomMaxBits && m.toLong < BloomSizeFactor * nShingles)
      m <<= 1
    m
  }

  /** CMS grid: depth (independent hash rows) × width (counters per row).
    * Error bound: overcount ≤ e·N/w with probability 1 − e^(−d).
    */
  val CmsDepth = 4
  val CmsWidth = 8192

  /** HLL register count m = 2^6; standard error ≈ 1.04/√m ≈ 13%. */
  val HllBuckets = 64

  /** Heavy-hitter report size. */
  val TopHitters = 50

  /** Big-endian value of md5 hex nibbles [1, nibbles] of `sqlExpr` —
    * identical in any engine (the oracle rebuilds it nibble-by-nibble).
    */
  private def md5Val(sqlExpr: String, start: Int, nibbles: Int): Column =
    expr(s"cast(conv(substring(md5($sqlExpr), $start, $nibbles), 16, 10) as bigint)")

  /** Bloom bit position i of a shingle: the 24-bit value of md5 nibbles
    * [6i, 6i+6) mod m (2^24 mod 2^18 stays uniform). All k positions
    * derive from ONE md5 over disjoint bit ranges (the HLL device) — the
    * k references to md5(shingle) are common-subexpression-eliminated
    * inside whole-stage codegen, leaving one md5 + k cheap nibble
    * extractions per shingle. 4×24 = 96 bits of the 128 used, ranges
    * disjoint, so positions stay pairwise independent. The Column form
    * exists so the streaming twin (StreamingOps.bloomFlagStream) hashes
    * lambda-bound array elements through THE SAME definition — batch and
    * stream cannot drift apart.
    */
  private[graft] def bloomPositionOf(s: Column, i: Int): Column =
    bloomRawPositionOf(s, i) % BloomBits

  /** The RAW 24-bit position value — md5 nibbles [6i, 6i+6) before any
    * mod. The multi-benchmark gate projects THESE once per shingle and
    * lets each benchmark's differently-sized filter fold them down
    * (BitSetContains masks by its own width; every ladder rung divides
    * 2^24, so the fold IS `raw mod m`).
    */
  private[graft] def bloomRawPositionOf(s: Column, i: Int): Column =
    conv(substring(md5(s.cast("binary")), 1 + 6 * i, 6), 16, 10)
      .cast("long")

  private def bloomPosition(i: Int): Column =
    bloomPositionOf(col("shingle"), i)

  private def bloomPositions: Column =
    array((0 until BloomK).map(bloomPosition): _*)

  private[graft] val bitsCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]

  /** The eval (val+test) split's Bloom bit-set as a relation — the
    * distinct bit positions set by any eval shingle, ≤ BloomBits rows no
    * matter how large the eval corpus. Cached as an INDEX ARTIFACT
    * (CLAUDE.md cache taxonomy): a deployed decontamination pipeline
    * builds the bit-set once per eval benchmark and keeps it resident —
    * benchmarks don't change per ingest batch — so q102's repeated runs
    * must not re-pay the eval-side shingle scan (adjudicated round 16:
    * the un-cached eval leg was the artifact-eviction-sensitive half of
    * the r15 q102 anomaly).
    */
  def bloomEvalBits(spark: SparkSession, dir: String): DataFrame =
    bitsCache.getOrElseUpdate(
      s"${org.apache.spark.sql.GraftBridge.sessionKey(spark)}#$dir", {
        val splits = TextAnalysis.splitRaw(spark, dir).select("doc_id", "split")
        Dedup.shingles(spark, dir)
          .join(splits.filter(col("split") =!= "train").select("doc_id"),
            Seq("doc_id"), "left_semi")
          .select(explode(bloomPositions).as("pos")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })

  /** The eval bit-set packed into a BloomBits/4-character hex string —
    * the SERIALIZED form of the filter, the thing a deployed pipeline
    * actually ships: 2^18 bits = 64 KiB of hex, built once per eval
    * benchmark from the cached [[bloomEvalBits]] artifact and embedded as
    * a literal in every ingest executor's plan (exactly how Spark's own
    * runtime bloom-join pruning ships its filter). The collect is bounded
    * by construction: ≤ BloomBits rows regardless of eval-corpus size.
    * Packing: bit p lives at hex char p >> 2 (0-based), bit p & 3 within
    * the nibble — [[StreamingOps.bloomFlagStream]] tests the same layout.
    */
  def evalBitsHex(spark: SparkSession, dir: String): String =
    packBitsHex(bloomEvalBits(spark, dir).collect().map(_.getLong(0)))

  private[graft] def packBitsHex(positions: Array[Long]): String =
    packBitsHex(positions, BloomBits)

  /** Variable-width form (r19): the per-benchmark filters serialize at
    * their own ladder rung — the hex LENGTH carries the width, so no
    * side-channel size field exists to drift.
    */
  private[graft] def packBitsHex(positions: Array[Long], mBits: Int): String = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"bit-set width must be a power of two >= 64, got $mBits")
    val nib = new Array[Int](mBits / 4)
    positions.foreach { p =>
      require(p >= 0 && p < mBits, s"bloom position $p out of [0, $mBits)")
      nib((p >> 2).toInt) |= 1 << (p & 3).toInt
    }
    val sb = new java.lang.StringBuilder(nib.length)
    nib.foreach(v => sb.append("0123456789abcdef".charAt(v)))
    sb.toString
  }

  /** Decode a packBitsHex blob to the unboxed word array
    * [[graft.plans.BitSetContains]] probes — bit p at hex char p >> 2 /
    * bit p & 3 on the wire, re-packed to word p >> 6 / bit p & 63 in
    * memory. ONE definition shared by the batch multi-benchmark gate and
    * the streaming twins, so the packed layout cannot drift between
    * producers and consumers (SketchesSpec pins it as packBitsHex's exact
    * inverse). Why not a composable Column form: see BitSetContains's
    * scaladoc — the hex-substr probe cost 24.7 s warm and the
    * array-literal probe OOMed plan stringification (both measured r18).
    */
  private[graft] def hexBitWords(hex: String): Array[Long] = {
    // the width IS the length (packBitsHex's contract): any power-of-two
    // bit count >= 64 decodes — the per-benchmark filters vary (r19)
    val bits = hex.length * 4
    require(bits >= 64 && (bits & (bits - 1)) == 0,
      s"packed bit-set must be a power-of-two bit count >= 64, " +
        s"got ${hex.length} hex chars")
    val out = new Array[Long](bits / 64)
    var i = 0
    while (i < hex.length) {
      val v = Character.digit(hex.charAt(i), 16)
      require(v >= 0, s"non-hex char '${hex.charAt(i)}' at $i")
      var b = 0
      while (b < 4) {
        if ((v & (1 << b)) != 0) {
          val p = 4 * i + b
          out(p >> 6) |= 1L << (p & 63)
        }
        b += 1
      }
      i += 1
    }
    out
  }

  private[graft] val benchBitsCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private[graft] val evalShCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** The distinct (benchmark, shingle) eval relation — benchmarks are
    * the eval (val+test) split's sources. Shared by the bit-set build,
    * the q126 exact audit, the q128 sizing report, and (re-distinct'd to
    * shingle grain) q119's union-grain audit; bounded by the benchmarks,
    * never by the train corpus. INDEX-ARTIFACT cache class (r22): a
    * precomputable eval-side structure exactly like the bit-sets built
    * from it — before the cache every consumer re-ran the eval-side
    * semi-join + distinct per call. Registered in Caches.maps; filled in
    * Bench wave 2b in the SAME thunk as the bit-set build (sequential —
    * no concurrent getOrElseUpdate on the key).
    */
  private[graft] def benchEvalShingles(spark: SparkSession, dir: String): DataFrame =
    evalShCache.getOrElseUpdate(
      s"${org.apache.spark.sql.GraftBridge.sessionKey(spark)}#$dir", {
        val splits = TextAnalysis.splitRaw(spark, dir).select("doc_id", "split")
        Dedup.shingles(spark, dir)
          .join(splits.filter(col("split") =!= "train").select("doc_id"),
            Seq("doc_id"), "left_semi")
          .join(Tables.documents(spark, dir)
            .select(col("doc_id"), col("source").as("benchmark")), Seq("doc_id"))
          .select("benchmark", "shingle").distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })

  /** PER-BENCHMARK Bloom bit-sets — the multi-benchmark form of
    * [[bloomEvalBits]] (VERDICT r17 item 4): real pipelines screen one
    * train-side pass against DOZENS of eval benchmarks, each with its own
    * filter, not one merged set. Benchmarks here are the eval (val+test)
    * split's sources — each source's eval documents form one benchmark —
    * and the relation is (benchmark, mbits, pos) distinct, where mbits is
    * the benchmark's OWN ladder rung ([[sizedBloomBits]] of its distinct
    * shingle count — r19) and pos = the raw 24-bit value mod mbits: ≤
    * mbits rows per benchmark no matter how large its eval set, because
    * eval benchmarks are bounded (the thing that makes the whole sketch
    * affordable). The sizing counts are one bounded aggregate over the
    * eval-side relation, collected once at build (one row per benchmark).
    * INDEX ARTIFACT cache class: built once per benchmark suite, kept
    * resident across passes.
    */
  def benchEvalBits(spark: SparkSession, dir: String): DataFrame =
    benchBitsCache.getOrElseUpdate(
      s"${org.apache.spark.sql.GraftBridge.sessionKey(spark)}#$dir", {
        import spark.implicits._
        // the eval-side distinct is the cached INDEX relation since r22
        // (it feeds the sizing collect, the position projection, q126's
        // audit and q119's union-grain audit) — no per-build checkpoint
        val evd = benchEvalShingles(spark, dir)
        val sizes = evd.groupBy("benchmark").agg(count(lit(1)).as("n"))
          .as[(String, Long)].collect()
          .map { case (b, n) => (b, n, sizedBloomBits(n)) }.toSeq
        // a clamped rung is an ALARM, not a silent FP-rate drift (verdict
        // r19): past the 2^24 ceiling the factor-16 design point no
        // longer holds — the q128 report shows the realized rates, this
        // names the offender at build time
        sizes.filter(s => BloomSizeFactor * s._2 > BloomMaxBits.toLong)
          .foreach { case (b, n, _) =>
            System.err.println(s"[graft] bloom ladder CLAMPED for " +
              s"benchmark '$b': $n distinct eval shingles need m > 2^24 " +
              s"for the 0.24% FP design point — split the benchmark or " +
              s"raise the ladder before trusting its gate") }
        // n_eval rides the relation so q128's sizing report never
        // re-derives the count the build already paid for
        val mDf = sizes.toDF("benchmark", "n_eval", "mbits")
        val out = evd
          .join(broadcast(mDf), Seq("benchmark"))
          .select(col("benchmark"), col("n_eval"), col("mbits"),
            explode(array((0 until BloomK).map(i =>
              bloomRawPositionOf(col("shingle"), i)): _*)).as("raw"))
          .select(col("benchmark"), col("n_eval"), col("mbits"),
            (col("raw") % col("mbits")).as("pos"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // materialize the bit-set eagerly (the r19/r20 shape, minus the
        // per-build checkpoint reclaim — evd is now the long-lived cached
        // relation owned by Caches, NOT a build-local checkpoint)
        out.count()
        out
      })

  /** The per-benchmark bit-sets SERIALIZED — (benchmark, hex) pairs
    * sorted by benchmark, the blobs an ingest executor ships as plan
    * literals (the evalBitsHex shape, one per benchmark — each at its
    * own width, carried by the hex LENGTH). Collect is bounded by
    * construction: ≤ mbits rows per benchmark, and the benchmark
    * universe is the eval split's source list.
    */
  def benchBitsHex(spark: SparkSession, dir: String): Seq[(String, String)] =
    benchEvalBits(spark, dir).select("benchmark", "mbits", "pos").collect()
      .groupBy(_.getString(0)).toSeq.sortBy(_._1)
      .map { case (b, rows) =>
        b -> packBitsHex(rows.map(_.getLong(2)), rows.head.getInt(1)) }

  private[graft] val multiBloomMemo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** The unsorted per-(train doc, benchmark) flag relation — a RESULT
    * MEMO like [[bloomMemo]] (evicted per bench pass by
    * Caches.clearResultMemos). Scale shape: the train side — the 100 TB
    * side — is read ONCE, entirely map-side: the k bit positions are
    * projected once per shingle (shared across benchmarks), each
    * benchmark's all-k-hit flag is a per-row test against its OWN packed
    * bit-set literal (no join — the filter rides the task binary, exactly
    * how the streaming gate ships it), and everything collapses in ONE
    * partial-aggregated groupBy(doc_id) carrying one counter per
    * benchmark. The per-benchmark columns then stack to the tall
    * (doc, benchmark) grain map-side, and the only other shuffle is the
    * edge join back to the train-doc × benchmark universe.
    */
  private def multiBenchFlags(spark: SparkSession, dir: String): DataFrame =
    multiBloomMemo.getOrElseUpdate(
      s"${org.apache.spark.sql.GraftBridge.sessionKey(spark)}#$dir", {
        import spark.implicits._
        val benches = benchBitsHex(spark, dir)
        val splits = TextAnalysis.splitRaw(spark, dir).select("doc_id", "split")
        val trainDocs = splits.filter(col("split") === "train").select("doc_id")
        val out =
          if (benches.isEmpty)
            // no eval docs → no benchmarks: empty, correctly-typed
            trainDocs.select(col("doc_id"), lit("").as("benchmark"),
              lit(0L).as("n_shingles"), lit(0L).as("n_flagged")).limit(0)
          else {
            // RAW 24-bit positions, shared across benchmarks — each
            // benchmark's BitSetContains masks them down to its own
            // ladder rung (r19), so sizing costs zero extra projection
            val tagged = Dedup.shingles(spark, dir)
              .join(trainDocs, Seq("doc_id"), "left_semi")
              .select(col("doc_id") +:
                (0 until BloomK).map(i =>
                  bloomRawPositionOf(col("shingle"), i).as(s"_pos$i")): _*)
            val aggCols = count(lit(1)).as("n_shingles") +:
              benches.zipWithIndex.map { case ((b, hex), bi) =>
                val bits = hexBitWords(hex) // one array instance per benchmark
                val allHit = (0 until BloomK)
                  .map(i => graft.plans.BitSetContains(col(s"_pos$i"), bits, b))
                  .reduce(_ && _)
                sum(when(allHit, lit(1L)).otherwise(lit(0L))).as(s"_f$bi")
              }
            val agg = tagged.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
            val stacked = agg.select(col("doc_id"), col("n_shingles"),
              explode(array(benches.zipWithIndex.map { case ((b, _), bi) =>
                struct(lit(b).as("benchmark"), col(s"_f$bi").as("n_flagged"))
              }: _*)).as("bf"))
              .select(col("doc_id"), col("bf.benchmark"),
                col("n_shingles"), col("bf.n_flagged"))
            trainDocs
              .crossJoin(broadcast(benches.map(_._1).toDF("benchmark")))
              .join(stacked, Seq("doc_id", "benchmark"), "left")
              .select(col("doc_id"), col("benchmark"),
                coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
                coalesce(col("n_flagged"), lit(0L)).as("n_flagged"))
          }
        out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })

  /** q125 — multi-benchmark Bloom decontamination: q102's gate run
    * against EVERY benchmark's bit-set in the same single train-side
    * pass, one row per (train doc, benchmark). Each benchmark's exact
    * overlap is ⊆ its flags (Bloom never false-negatives — SketchesSpec
    * pins it per benchmark via q126), and the streaming twin
    * (StreamingOps.bloomFlagMultiStream) flags arriving docs against the
    * same serialized blobs bit-identically. Since r19 the filters are
    * sized per benchmark ([[sizedBloomBits]]), so a benchmark's flag
    * count is no longer bounded by the q102 union gate's — the union
    * filter and a small benchmark's filter live in different bit spaces.
    */
  def multiBenchDecontamination(spark: SparkSession, dir: String): DataFrame =
    multiBenchFlags(spark, dir).orderBy("doc_id", "benchmark")

  /** q126 — the per-benchmark Bloom FALSE-POSITIVE audit (q119's shape at
    * q125's grain): each benchmark's flags joined against the exact
    * train∩benchmark shingle overlap, n_false_pos = flagged − exact per
    * (train doc, benchmark) — ≥ 0 PER BENCHMARK, since each filter can
    * only over-flag its own set. This is the calibration that actually
    * sizes m: benchmarks differ in shingle count by orders of magnitude,
    * so one union-grain FP rate (q119) can hide a saturated small filter
    * next to an oversized big one — the per-benchmark audit names which
    * benchmark's m to resize before the gate deploys at 100 TB. The exact
    * side joins the unbounded train side ONCE against the BROADCAST
    * distinct (benchmark, shingle) relation (bounded by the benchmarks),
    * fanning each matching shingle to only the benchmarks holding it.
    */
  def multiBenchFpAudit(spark: SparkSession, dir: String): DataFrame =
    multiBenchFpRaw(spark, dir).orderBy("doc_id", "benchmark")

  private[graft] val multiBenchFpMemo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** The unsorted audit relation — q126 sorts it at (doc, benchmark)
    * grain; q128 aggregates it to benchmark grain (no sort below an agg).
    * A RESULT MEMO like [[multiBloomMemo]] (review r19): the exact-
    * overlap leg re-reads the train-side shingles, so within a pass the
    * alphabetically-first consumer (q126) pays it once and q128 reuses;
    * `Caches.clearResultMemos` evicts it so every bench pass re-pays.
    */
  private def multiBenchFpRaw(spark: SparkSession, dir: String): DataFrame =
    multiBenchFpMemo.getOrElseUpdate(
      s"${org.apache.spark.sql.GraftBridge.sessionKey(spark)}#$dir", {
        val splits = TextAnalysis.splitRaw(spark, dir).select("doc_id", "split")
        val exact = Dedup.shingles(spark, dir)
          .join(splits.filter(col("split") === "train").select("doc_id"),
            Seq("doc_id"), "left_semi")
          .join(broadcast(benchEvalShingles(spark, dir)), Seq("shingle"))
          .groupBy("doc_id", "benchmark").agg(count(lit(1)).as("n_exact"))
        multiBenchFlags(spark, dir)
          .join(exact, Seq("doc_id", "benchmark"), "left")
          .select(col("doc_id"), col("benchmark"), col("n_shingles"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"), col("n_flagged"),
            (col("n_flagged") - coalesce(col("n_exact"), lit(0L)))
              .as("n_false_pos"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })

  /** q128 — the Bloom SIZING report, benchmark grain (r19, verdict r18
    * item 2's calibration deliverable): for each benchmark, its distinct
    * eval-shingle count, the ladder rung [[sizedBloomBits]] picked from
    * it, and the gate's aggregate outcome against THAT filter — total
    * flags, exact overlap, and false positives across the train corpus.
    * This is the table an operator reads before deploying the gate at
    * 100 TB: a benchmark whose n_false_pos is high relative to its
    * n_train_rows has outgrown its rung (impossible under the factor-16
    * ladder until the 2^24 clamp binds). All-integer output (the oracle
    * hash-compares exactly); rates are the reader's division.
    */
  def bloomSizingReport(spark: SparkSession, dir: String): DataFrame = {
    // counts and rungs ride the cached bit-set relation — the build
    // already paid the eval-side aggregate (review r19)
    val sizes = benchEvalBits(spark, dir)
      .select("benchmark", "n_eval", "mbits").distinct()
    val agg = multiBenchFpRaw(spark, dir)
      .groupBy("benchmark").agg(
        count(lit(1)).as("n_train_rows"),
        sum("n_flagged").as("n_flagged"),
        sum("n_exact").as("n_exact"),
        sum("n_false_pos").as("n_false_pos"))
    sizes
      .join(agg, Seq("benchmark"))
      .select(col("benchmark"), col("n_eval").as("n_eval_shingles"),
        col("mbits").cast("long").as("m_bits"), col("n_train_rows"),
        col("n_flagged"), col("n_exact"), col("n_false_pos"))
      .orderBy("benchmark")
  }

  /** Per-train-doc contamination counts against a Bloom filter of the
    * eval (val+test) split's 5-gram shingles: `n_flagged` = shingles whose
    * k positions are ALL set in the eval bit-set (possible contamination,
    * superset of the exact overlap — Bloom never false-negatives), next to
    * the doc's total shingle count. Same split and shingle definitions as
    * q56/q59. Scale shape: the eval side collapses to ≤ m DISTINCT bit
    * positions (the cached [[bloomEvalBits]] artifact, broadcast,
    * constant-size); the train side — the 100 TB side — is read ONCE,
    * entirely map-side: the k positions are projected as k columns (no
    * explode — the r15 form inflated the train side 4× and shuffled it on
    * (doc_id, shingle) for the all-k-hit test), each tested by its own
    * broadcast left join against the bit-set, and the all-hit flag plus
    * the shingle count collapse in ONE partial-aggregated groupBy(doc_id).
    * The only shuffles are doc-grained: the partial agg and the edge join
    * back to the train-doc universe.
    */
  private[graft] val bloomMemo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** The unsorted per-train-doc flag relation — a RESULT MEMO (a detection
    * OUTPUT, same cache class as the verified-pair relations): within a
    * pass the alphabetically-first consumer (q102) pays the train-side
    * scan once and q119's audit reuses it; `Caches.clearResultMemos`
    * evicts it so every bench pass re-pays the detection.
    */
  private def bloomFlags(spark: SparkSession, dir: String): DataFrame =
    bloomMemo.getOrElseUpdate(
      s"${org.apache.spark.sql.GraftBridge.sessionKey(spark)}#$dir", {
        val splits = TextAnalysis.splitRaw(spark, dir).select("doc_id", "split")
        val trainDocs = splits.filter(col("split") === "train").select("doc_id")
        val bits = bloomEvalBits(spark, dir)
        val tagged = Dedup.shingles(spark, dir)
          .join(trainDocs, Seq("doc_id"), "left_semi")
          .select(col("doc_id") +:
            (0 until BloomK).map(i => bloomPosition(i).as(s"_pos$i")): _*)
        val hit = (0 until BloomK).foldLeft(tagged) { (df, i) =>
          df.join(broadcast(bits.select(col("pos").as(s"_hit$i"))),
            df(s"_pos$i") === col(s"_hit$i"), "left")
        }
        val allHit =
          (0 until BloomK).map(i => col(s"_hit$i").isNotNull).reduce(_ && _)
        val agg = hit.groupBy("doc_id").agg(
          count(lit(1)).as("n_shingles"),
          sum(when(allHit, lit(1L)).otherwise(lit(0L))).as("n_flagged"))
        trainDocs
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
            coalesce(col("n_flagged"), lit(0L)).as("n_flagged"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })

  def bloomDecontamination(spark: SparkSession, dir: String): DataFrame =
    bloomFlags(spark, dir).orderBy("doc_id")

  /** Per-train-doc Bloom FALSE-POSITIVE audit (q119) — the q102 flags
    * joined against the exact eval-shingle overlap: `n_exact` = shingles
    * literally present in the eval split's shingle set, `n_false_pos` =
    * n_flagged − n_exact (≥ 0 — Bloom never false-negatives, so flags are
    * a superset). This is the calibration run a pipeline does at SAMPLE
    * scale before trusting the sketch at 100 TB: if the measured FP rate
    * says the filter is saturating (kn/m too high — at sf0.1 the suite's
    * 2^18-bit filter holds ~70k eval shingles and measurably over-flags),
    * resize m per eval benchmark. The exact side joins train shingles
    * against the BROADCAST distinct eval shingle set — affordable
    * precisely because eval benchmarks are bounded; the unbounded train
    * side is still read once, map-side.
    */
  def bloomFpAudit(spark: SparkSession, dir: String): DataFrame = {
    val splits = TextAnalysis.splitRaw(spark, dir).select("doc_id", "split")
    val sh = Dedup.shingles(spark, dir)
    // union-grain eval set = the cached benchmark-grain INDEX relation
    // re-distinct'd to shingle grain (every eval doc has a source, so the
    // union over benchmarks IS the eval split's shingle set) — the inline
    // form re-ran the eval-side semi-join + distinct per call (r22)
    val evalShingles = benchEvalShingles(spark, dir)
      .select("shingle").distinct()
    val exact = sh.join(
      splits.filter(col("split") === "train").select("doc_id"),
      Seq("doc_id"), "left_semi")
      .join(broadcast(evalShingles), Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))
    bloomFlags(spark, dir)
      .join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"), col("n_flagged"),
        (col("n_flagged") - coalesce(col("n_exact"), lit(0L))).as("n_false_pos"))
      .orderBy("doc_id")
  }

  /** The CmsDepth bucket columns of a `shingle` column — ONE definition
    * shared by the batch grid and the streaming twin
    * (StreamingOps.cmsCells), so the hash mapping cannot drift.
    */
  private[graft] def cmsBucketArray: Column =
    array((0 until CmsDepth).map(i =>
      md5Val(s"concat('$i|', shingle)", 1, 5) % CmsWidth): _*)

  /** Per-shingle document frequencies (the cached index artifact) with
    * (i, bucket) CMS coordinates attached — the grid build's input.
    */
  private def cmsTagged(spark: SparkSession, dir: String): DataFrame =
    Dedup.shingleDf(spark, dir)
      .select(col("shingle"), col("df").as("n_exact"),
        posexplode(cmsBucketArray).as(Seq("i", "bucket")))

  private[graft] val cmsGridCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** The d×w cell grid as a relation — q103's sketch state, also the
    * batch side of the streaming twin's cell-for-cell parity test.
    * INDEX-ARTIFACT cache class (r21, VERDICT r20 item 1): precomputable
    * per-corpus sketch state exactly like the shingle-df relation it
    * derives from — a deployment builds the d×w grid once per corpus and
    * keeps it resident (it is CONSTANT-size: CmsDepth·CmsWidth = 32,768
    * rows whatever the corpus). Before this cache q103 re-paid the
    * grid's posexplode + groupBy every pass, and that rebuild was the
    * slot's dominant, high-variance cost (r21 QProbe: 1.14–2.15 s warm
    * across 3 same-host passes; the r20 drift flag). Registered in
    * Caches.maps (index class) with a wave-2b fill thunk.
    */
  def cmsCells(spark: SparkSession, dir: String): DataFrame =
    cmsGridCache.getOrElseUpdate(
      s"${org.apache.spark.sql.GraftBridge.sessionKey(spark)}#$dir",
      cmsTagged(spark, dir).groupBy("i", "bucket").agg(sum("n_exact").as("cell"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Top-`TopHitters` 5-gram shingles by exact document frequency, with
    * the count-min-sketch estimate and its overcount (provably ≥ 0)
    * beside the exact count — the boilerplate pre-pass: at 100 TB the
    * sketch names the heavy shingles (license headers, navigation chrome)
    * that the dedup ladder's `maxShingleDf` skew hatch should drop,
    * without keying a full shuffle on the unbounded shingle universe.
    * The d×w cell grid is built by one partial-aggregated groupBy and
    * broadcast back for the estimate join — constant sketch state while
    * the shingle universe grows with the corpus.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    // the report set first (TakeOrdered, 50 rows), THEN the estimate
    // lookup — estimates are per-row table probes of the finished grid,
    // so only the reported shingles pay the join (the r12 first cut
    // estimated all ~|universe| shingles and made q103 the second most
    // expensive warm query in the suite; result is identical)
    val top = Dedup.shingleDf(spark, dir)
      .select(col("shingle"), col("df").as("n_exact"))
      .orderBy(col("n_exact").desc, col("shingle"))
      .limit(TopHitters)
    top
      .select(col("shingle"), col("n_exact"),
        posexplode(cmsBucketArray).as(Seq("i", "bucket")))
      .join(broadcast(cmsCells(spark, dir)), Seq("i", "bucket"))
      .groupBy("shingle").agg(min("cell").as("n_est"), max("n_exact").as("n_exact"))
      .select(col("shingle"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("shingle"))
  }

  /** Per-source HyperLogLog registers over distinct 5-gram shingles:
    * bucket = md5 nibbles 1–2 mod m, rho = rank of the first 1-bit in the
    * 52-bit value of nibbles 3–15 (53 − bit-length; 53 when zero),
    * register = MAX(rho) — plus the `__all__` group merging every source's
    * registers by cell-wise MAX (the union sketch, identical to sketching
    * the union directly). MAX ignores duplicates, so the input needs no
    * distinct shuffle; the whole operator is one partial-aggregated
    * groupBy producing ≤ (sources+1)·m rows of queryable sketch state.
    */
  def hllRegisters(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Dedup.shingles(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), Seq("doc_id"))
      .select(col("source"),
        (md5Val("shingle", 1, 2) % HllBuckets).as("bucket"),
        md5Val("shingle", 3, 13).as("v"))
      .select(col("source"), col("bucket"),
        when(col("v") === 0, lit(53))
          .otherwise(lit(53) - length(bin(col("v")))).cast("long").as("rho"))
      .groupBy("source", "bucket").agg(max("rho").as("register"))
    val merged = perSource.groupBy("bucket")
      .agg(max("register").as("register"))
      .select(lit("__all__").as("source"), col("bucket"), col("register"))
    perSource.unionByName(merged)
      .orderBy("source", "bucket")
  }

  /** Histogram-quantile geometry (q108) — bins × width bounds the value
    * range [0, QBins·QBinWidth); token counts above it clamp into the
    * last bin (none do at our SFs).
    */
  val QBins = 256
  val QBinWidth = 32

  /** Fixed-bin histogram quantiles (q108) — the quantile member of the
    * sketch quartet (Bloom / CMS / HLL / histogram): per-source token-
    * length p10/p50/p90 estimated from a CONSTANT ≤256-cell counting
    * histogram instead of q89's exact per-source ranking window. The
    * estimate picks the bin holding q89's exact rank index (rank =
    * (n−1)·p div 100 + 1 over ascending counts — the identical index
    * arithmetic) and reports the bin's inclusive upper edge, so
    * estimate − exact ∈ [0, QBinWidth) by construction — the bound
    * SketchesSpec asserts against q89 directly. Scale shape: the only
    * per-document work is one map-side bin projection; the shuffle
    * carries (source, bin) partial counts — at most 256 cells per source
    * per partition, the mergeable sketch state — and every window runs
    * over the ≤256-row histogram, never over documents. At 100 TB this
    * is the difference between shipping 2 KB per source per executor and
    * globally sorting a corpus.
    */
  def histogramQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val counts = TextAnalysis.rawTokens(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), Seq("doc_id"))
      .select(col("source"),
        expr(s"cast(least(size(toks) div $QBinWidth, ${QBins - 1}) as bigint)")
          .as("bin"))
    val hist = counts.groupBy("source", "bin").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("source").orderBy("bin")
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("source")))
    def est(p: Int) =
      min(when(col("cum") >= expr(s"((n - 1) * $p) div 100 + 1"),
        (col("bin") + 1) * QBinWidth - 1))
    cum.groupBy("source")
      .agg(max(col("n")).as("n_docs"),
        est(10).as("est_p10"), est(50).as("est_p50"), est(90).as("est_p90"))
      .orderBy("source")
  }
}
