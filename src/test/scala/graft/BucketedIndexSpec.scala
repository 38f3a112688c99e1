package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-by-hash chunk index (q116 / VERDICT r13 #1): append-shaped
  * incremental updates into a chunk_hash-bucketed catalog table, stored
  * side never shuffled, catalog loss recoverable from the on-disk bucket
  * files.
  */
class BucketedIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text").select(col("doc_id"),
      graft.functions.TextFns.tokenize(col("text")).as("toks"))

  private def words(p: String, a: Int, b: Int): String =
    (a to b).map(i => s"$p$i").mkString(" ")

  // two chunks (W=64, S=48) and one chunk respectively
  private val base = words("a", 1, 70)
  private val fresh = words("b", 500, 540)

  private def partFiles(path: String): Set[String] = {
    val d = new java.io.File(path)
    if (!d.exists) Set.empty
    else d.listFiles.map(_.getName).filter(_.startsWith("part-")).toSet
  }

  test("bootstrap, delta APPEND (no rewrite), verbatim no-op") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx").toString
    val (table, path) = ("graft_bidx_t1", s"$tmp/idx")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val m1 = Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(1L -> base)), table, path)
      assert(m1("hashes_before") === 0L && m1("hashes_added") === 2L &&
        m1("hashes_after") === 2L)
      val f1 = partFiles(path)
      assert(f1.nonEmpty)
      // delta: one verbatim re-send (its hashes already stored) + one new
      val m2 = Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(2L -> base, 3L -> fresh)), table, path)
      assert(m2("hashes_before") === 2L && m2("hashes_added") === 1L &&
        m2("hashes_after") === 3L)
      val f2 = partFiles(path)
      assert(f1.subsetOf(f2) && f2.size > f1.size,
        s"delta must APPEND bucket files, got before=$f1 after=$f2")
      // verbatim replay: zero added hashes, zero file churn
      val m3 = Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(4L -> base, 5L -> fresh)), table, path)
      assert(m3("hashes_added") === 0L && m3("hashes_after") === 3L)
      assert(partFiles(path) === f2, "no-new-hashes update must not touch files")
      // the stored table holds exactly the corpus's distinct chunk hashes
      val want = graft.operators.TextAnalysis.chunksOf(
        toks(Seq(1L -> base, 3L -> fresh)),
        graft.operators.TextAnalysis.ChunkWidth, 0)
        .select("chunk_hash").distinct().as[String].collect().sorted.toSeq
      assert(spark.table(table).as[String].collect().sorted.toSeq === want)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("bucketed and rename-swap layouts converge to the same stored hash set") {
    // the two physical forms of the chunk index must be interchangeable
    // views of one logical artifact: the SAME dump sequence, applied in
    // the same order through updateChunkIndex (rename swap, full rewrite)
    // and updateChunkIndexBucketed (bucketed appends), must land the
    // identical distinct-hash set — whatever the split boundaries, dup
    // overlap, or bootstrap size
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_diff").toString
    val (table, path) = ("graft_bidx_t4", s"$tmp/bidx")
    val renameIdx = s"$tmp/ridx/chunk_index.parquet"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val mid = words("a", 40, 110) // overlaps base's token run partially
      val dumps = Seq(
        Seq(1L -> base),
        Seq(2L -> base, 3L -> mid, 4L -> fresh),
        Seq(5L -> mid, 6L -> words("c", 900, 980)))
      val (rs, bs) = dumps.map { d =>
        (Pipeline.updateChunkIndex(spark, toks(d), renameIdx),
          Pipeline.updateChunkIndexBucketed(spark, toks(d), table, path))
      }.unzip
      // per-step counters agree form-to-form, not just the final set
      rs.zip(bs).foreach { case (r, b) => assert(r === b) }
      assert(Pipeline.readChunkIndex(spark, renameIdx)
        .as[String].collect().sorted.toSeq ===
        spark.table(table).as[String].collect().sorted.toSeq)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("layout differential holds on seeded random corpora and splits") {
    // beyond the fixed three-dump case: random doc lengths, overlapping
    // token runs (so dumps share chunks), and random dump boundaries —
    // both layouts must agree per step and in the final set. Seeded, so
    // failures reproduce.
    val rnd = new scala.util.Random(20260814L)
    for (corpus <- 1 to 3) {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_bidx_rnd$corpus").toString
      val (table, path) = (s"graft_bidx_rnd$corpus", s"$tmp/bidx")
      val renameIdx = s"$tmp/ridx/chunk_index.parquet"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      try {
        val docs = (1 to 6 + rnd.nextInt(5)).map { i =>
          val start = rnd.nextInt(300)          // overlapping runs share chunks
          val len = 20 + rnd.nextInt(160)       // some docs under one window
          i.toLong -> words("r", start, start + len)
        }
        val splits = docs.grouped(2 + rnd.nextInt(3)).toSeq // random dump sizes
        splits.foreach { d =>
          val r = Pipeline.updateChunkIndex(spark, toks(d), renameIdx)
          val b = Pipeline.updateChunkIndexBucketed(spark, toks(d), table, path)
          assert(r === b, s"corpus $corpus: per-step counters diverged on $d")
        }
        assert(Pipeline.readChunkIndex(spark, renameIdx)
          .as[String].collect().sorted.toSeq ===
          spark.table(table).as[String].collect().sorted.toSeq,
          s"corpus $corpus: final hash sets diverged")
      } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("catalog loss re-registers the on-disk bucket files — never truncates") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_cat").toString
    val (table, path) = ("graft_bidx_t2", s"$tmp/idx")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(1L -> base, 2L -> fresh)), table, path)
      // the table is EXTERNAL (writeBucketed passes an explicit path), so
      // dropping it models a lost metastore with surviving data files
      spark.sql(s"DROP TABLE $table")
      assert(partFiles(path).nonEmpty, "drop must keep the external data files")
      // next update must ADOPT the committed files (hashes_before = 3),
      // not re-bootstrap the table from the dump alone
      val m = Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(3L -> base)), table, path)
      assert(m("hashes_before") === 3L && m("hashes_added") === 0L &&
        m("hashes_after") === 3L)
      assert(spark.table(table).count() === 3L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("compaction-first maintenance heals a catalog loss like an update does (advice r15)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_catc").toString
    val (table, path) = ("graft_bidx_t7", s"$tmp/idx")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(1L -> base, 2L -> fresh)), table, path)
      val before = spark.table(table).as[String].collect().sorted.toSeq
      spark.sql(s"DROP TABLE $table") // lost metastore, surviving files
      assert(partFiles(path).nonEmpty, "drop must keep the external data files")
      // no staging anchor exists, so pre-fix this aborted at
      // require(tableExists) with a misleading "nothing to compact"
      val m = Pipeline.compactChunkIndexBucketed(spark, table, path)
      assert(m("hashes") === before.size.toLong && m("recovered") === 0L)
      assert(spark.table(table).as[String].collect().sorted.toSeq === before)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("point probe prunes to one bucket; compaction folds generations, set unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_cmp").toString
    val (table, path) = ("graft_bidx_t5", s"$tmp/idx")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val autoBefore = spark.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      // two ~40-chunk docs (64·40 tokens, stride 64) so generations
      // genuinely collide in buckets and compaction has files to fold
      val big1 = words("x", 1, 2560)
      val big2 = words("y", 1, 2560)
      Pipeline.updateChunkIndexBucketed(spark, toks(Seq(1L -> big1)), table, path)
      Pipeline.updateChunkIndexBucketed(spark, toks(Seq(2L -> big2)), table, path)
      val before = spark.table(table).as[String].collect().sorted.toSeq
      val filesBefore = partFiles(path)
      assert(filesBefore.size > Pipeline.ChunkIndexBuckets,
        s"two generations should exceed one file per bucket, got ${filesBefore.size}")

      // point probe: stored hash found, novel hash absent — and the scan
      // is bucket-pruned (1 of 32) under the pinned conf
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      assert(Pipeline.probeChunkIndex(spark, table, before.head))
      assert(!Pipeline.probeChunkIndex(spark, table,
        "00000000000000000000000000000000"))
      val probePlan = spark.table(table)
        .filter(col("chunk_hash") === before.head)
        .queryExecution.executedPlan.toString
      assert(probePlan.contains(
        s"SelectedBucketsCount: 1 out of ${Pipeline.ChunkIndexBuckets}"),
        s"expected bucket-pruned probe, got:\n$probePlan")

      val m = Pipeline.compactChunkIndexBucketed(spark, table, path)
      assert(m("hashes") === before.size.toLong)
      val filesAfter = partFiles(path)
      assert(filesAfter.size < filesBefore.size &&
        filesAfter.size <= Pipeline.ChunkIndexBuckets,
        s"compaction must fold generations: ${filesBefore.size} -> ${filesAfter.size}")
      assert(spark.table(table).as[String].collect().sorted.toSeq === before,
        "compaction must not change the stored hash set")
      // the compacted table still takes incremental updates
      val m2 = Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(3L -> fresh)), table, path)
      assert(m2("hashes_added") === 1L &&
        m2("hashes_after") === before.size.toLong + 1L)
    } finally {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", autoBefore)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("compaction crash arms: adopt the bigger staging, never the stale one") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_crash").toString
    val (table, path) = ("graft_bidx_t6", s"$tmp/idx")
    val staging = s"$path.compact-staging"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val big = words("z", 1, 2560) // ~40 chunks
      Pipeline.updateChunkIndexBucketed(spark, toks(Seq(1L -> big)), table, path)
      val all = spark.table(table).as[String].collect().sorted.toSeq
      assert(all.size > 10)
      // ARM 1 — mid-overwrite crash: staging holds the full committed
      // set, the dying rewrite left the table truncated to a subset.
      // Append-only monotonicity: staging > table ⇒ staging is truth.
      spark.table(table).write.mode("overwrite").parquet(staging)
      val subset = spark.read.schema("chunk_hash STRING").parquet(staging)
        .orderBy("chunk_hash").limit(all.size / 2)
      graft.sources.Sources.writeBucketed(subset, table, path,
        Pipeline.ChunkIndexBuckets, "chunk_hash", Seq("chunk_hash"))
      assert(spark.table(table).count() < all.size.toLong)
      val m1 = Pipeline.compactChunkIndexBucketed(spark, table, path)
      assert(m1("recovered") === 1L && m1("hashes") === all.size.toLong)
      assert(spark.table(table).as[String].collect().sorted.toSeq === all,
        "crashed overwrite must be recovered from the staging anchor")
      // ARM 2 — stale staging: a compaction committed but died before
      // cleanup (staging equals the table), then NEW hashes appended.
      // staging ≤ table ⇒ table is truth; adopting would truncate.
      spark.table(table).write.mode("overwrite").parquet(staging)
      Pipeline.updateChunkIndexBucketed(spark, toks(Seq(2L -> fresh)), table, path)
      val m2 = Pipeline.compactChunkIndexBucketed(spark, table, path)
      assert(m2("recovered") === 0L && m2("hashes") === all.size.toLong + 1L)
      assert(spark.table(table).count() === all.size.toLong + 1L,
        "stale staging must not truncate post-compaction appends")
      assert(!new java.io.File(staging).exists,
        "committed compaction must clean its staging anchor")
      // ARM 3 — the first writer after a crashed compaction may be the
      // DAILY UPDATE, not a compaction re-run: it must adopt the anchor
      // BEFORE adjudicating bootstrap-vs-incremental, or today's
      // hashes_before would read from the truncated subset
      val full = spark.table(table).as[String].collect().sorted.toSeq
      spark.table(table).write.mode("overwrite").parquet(staging)
      val sub2 = spark.read.schema("chunk_hash STRING").parquet(staging)
        .orderBy("chunk_hash").limit(full.size / 2)
      graft.sources.Sources.writeBucketed(sub2, table, path,
        Pipeline.ChunkIndexBuckets, "chunk_hash", Seq("chunk_hash"))
      val m3 = Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(3L -> words("q", 700, 740))), table, path)
      assert(m3("hashes_before") === full.size.toLong,
        "the daily update must heal a crashed compaction before updating")
      assert(m3("hashes_added") === 1L)
      assert(!new java.io.File(staging).exists,
        "the healing update must clean the adopted anchor")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("catalog-loss adoption honors the written bucket spec, not the parameter") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_spec").toString
    val (table, path) = ("graft_bidx_t7", s"$tmp/idx")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      // bootstrap at a NON-default bucket count (the docstring tells
      // operators to size buckets at bootstrap)
      Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(1L -> base, 2L -> fresh)), table, path, buckets = 8)
      spark.sql(s"DROP TABLE $table") // lost catalog, surviving files
      // the default-parameter daily update must re-register INTO 8
      // BUCKETS (the sidecar's count) and keep appending correctly
      val m = Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(3L -> words("d", 800, 860))), table, path)
      assert(m("hashes_before") === 3L && m("hashes_added") === 1L)
      val desc = spark.sql(s"DESCRIBE EXTENDED $table").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc("Num Buckets") === "8",
        s"adoption must re-declare the WRITTEN bucket count, got $desc")
      assert(spark.table(table).count() === 4L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("stale anchor + catalog loss: committed files win, appends survive") {
    // advice r14 (medium): adjudicating the staging anchor against -1
    // when the CATALOG lacks the table conflated 'catalog forgot' with
    // 'no data on disk' — a stale anchor lingering across later appends
    // would be adopted after a catalog loss and silently truncate every
    // post-compaction append. Ground truth is the committed part- files.
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_stale").toString
    val (table, path) = ("graft_bidx_t8", s"$tmp/idx")
    val staging = s"$path.compact-staging"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(1L -> words("s", 1, 2560))), table, path)
      val n = spark.table(table).count()
      // stale anchor: compaction committed, died before cleanup…
      spark.table(table).write.mode("overwrite").parquet(staging)
      // …then a later append landed (anchor now MISSES this hash)…
      Pipeline.updateChunkIndexBucketed(spark, toks(Seq(2L -> fresh)), table, path)
      assert(spark.table(table).count() === n + 1L)
      // …then the catalog forgot the table (new session / lost metastore)
      spark.sql(s"DROP TABLE $table")
      assert(new java.io.File(staging).exists && partFiles(path).nonEmpty)
      val m = Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(3L -> words("t", 900, 940))), table, path)
      assert(m("hashes_before") === n + 1L,
        "catalog loss must adopt the committed files, never a stale anchor")
      assert(m("hashes_added") === 1L && m("hashes_after") === n + 2L)
      assert(spark.table(table).count() === n + 2L,
        "the post-compaction append must survive the catalog loss")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("default-parameter compaction keeps the bootstrap bucket count") {
    // advice r14 (medium): compaction must rewrite at the sidecar's
    // count (what the files were written with), not the caller's
    // parameter — a default-argument compaction of an 8-bucket table
    // must not silently re-lay it out into 32 buckets.
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_cbk").toString
    val (table, path) = ("graft_bidx_t9", s"$tmp/idx")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(1L -> base)), table, path, buckets = 8)
      Pipeline.updateChunkIndexBucketed(spark, toks(Seq(2L -> fresh)), table, path)
      val before = spark.table(table).as[String].collect().sorted.toSeq
      val m = Pipeline.compactChunkIndexBucketed(spark, table, path) // default buckets
      assert(m("hashes") === before.size.toLong)
      val desc = spark.sql(s"DESCRIBE EXTENDED $table").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc("Num Buckets") === "8",
        s"compaction must preserve the written bucket count, got $desc")
      assert(spark.table(table).as[String].collect().sorted.toSeq === before)
      // and the sidecar still records 8, so later adoption stays correct
      spark.sql(s"DROP TABLE $table")
      val m2 = Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(3L -> words("u", 950, 990))), table, path)
      assert(m2("hashes_before") === before.size.toLong && m2("hashes_added") === 1L)
      val desc2 = spark.sql(s"DESCRIBE EXTENDED $table").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc2("Num Buckets") === "8")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("probe never touches the caller's session conf") {
    // advice r14 (low): the probe's conf pin lives on a cloned session;
    // the shared conf is never flipped, so concurrent planning in the
    // caller's session can't observe bucketed scans disabled.
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_iso").toString
    val (table, path) = ("graft_bidx_t10", s"$tmp/idx")
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val autoBefore = spark.conf.get(key)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      Pipeline.updateChunkIndexBucketed(spark, toks(Seq(1L -> base)), table, path)
      val stored = spark.table(table).as[String].collect().head
      spark.conf.set(key, "true")
      assert(Pipeline.probeChunkIndex(spark, table, stored))
      assert(!Pipeline.probeChunkIndex(spark, table,
        "00000000000000000000000000000000"))
      assert(spark.conf.get(key) === "true",
        "probe must leave the caller's autoBucketedScan conf as found")
    } finally {
      spark.conf.set(key, autoBefore)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("maintainChunkIndex defaults to the bucketed catalog layout") {
    // VERDICT r14 #4: the bucketed form is THE default index path; the
    // rename-swap single-dir form is the catalog-free fallback selected
    // by table = "".
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_disp").toString
    val table = Pipeline.DefaultChunkIndexTable
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val m = Pipeline.maintainChunkIndex(spark, toks(Seq(1L -> base)), s"$tmp/idx")
      assert(m("hashes_added") === 2L)
      assert(spark.catalog.tableExists(table),
        "default dispatch must create the bucketed catalog table")
      val desc = spark.sql(s"DESCRIBE EXTENDED $table").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc("Num Buckets") === Pipeline.ChunkIndexBuckets.toString)
      // fallback: empty table name → rename-swap single parquet dir,
      // no catalog registration
      val m2 = Pipeline.maintainChunkIndex(spark, toks(Seq(2L -> fresh)),
        s"$tmp/idx2", table = "")
      assert(m2("hashes_added") === 1L)
      assert(new java.io.File(s"$tmp/idx2/_SUCCESS").exists,
        "fallback must write the single-dir rename layout")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("incremental anti-join: stored side reads bucketed, ONE Exchange total") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bidx_plan").toString
    val (table, path) = ("graft_bidx_t3", s"$tmp/idx")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val shuffleBefore = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      Pipeline.updateChunkIndexBucketed(spark,
        toks(Seq(1L -> base)), table, path)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // deployment shape: shuffle partitions = bucket count, so the dump
      // side's distinct lands AT the join's required partitioning and the
      // whole update plan carries exactly one exchange
      spark.conf.set("spark.sql.shuffle.partitions",
        Pipeline.ChunkIndexBuckets.toString)
      val dump = graft.operators.TextAnalysis.chunksOf(
        toks(Seq(2L -> base, 3L -> fresh)),
        graft.operators.TextAnalysis.ChunkWidth, 0)
        .select("chunk_hash").distinct()
      val probe = dump.join(spark.table(table), Seq("chunk_hash"), "left_anti")
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges === 1,
        s"expected ONE exchange (dump side only — the bucketed store must " +
          s"not shuffle), got $exchanges:\n$plan")
      assert(probe.as[String].collect().sorted.toSeq ===
        graft.operators.TextAnalysis.chunksOf(toks(Seq(3L -> fresh)),
          graft.operators.TextAnalysis.ChunkWidth, 0)
          .select("chunk_hash").distinct().as[String].collect().sorted.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.shuffle.partitions", shuffleBefore)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
