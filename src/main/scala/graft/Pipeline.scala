package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** One-call training-corpus materialization — the write side of the q81
  * verdict, shaped the way a 100 TB run lands data:
  *
  *  - `train` partition: only pipeline survivors (train_ok = 1 — deduped,
  *    quality-passed, decontaminated);
  *  - `val`/`test` partitions: their full hash-split membership (eval
  *    sets are sacred — no quality filter touches them);
  *  - layout partitioned by (split, source), so downstream readers prune
  *    at the directory level (split = partition filter, source = the
  *    mixture knob);
  *  - a JSON manifest with per-split counts next to the data — the
  *    hand-off contract a tokenizer job reads instead of re-counting.
  *
  * The verdict relation is computed once; the writes are three
  * partition-pruned filters over the same join, so the corpus text is
  * scanned once per split at most.
  */
object Pipeline {

  def materialize(spark: SparkSession, dir: String, outPath: String): Map[String, Long] = {
    val verdict = TextAnalysis.trainCorpus(spark, dir)
      .select("doc_id", "split", "train_ok")
    val keep = verdict.filter(
      (col("split") === "train" && col("train_ok") === 1L) ||
        col("split") =!= "train")
    val out = Tables.documents(spark, dir)
      .join(keep, Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
        col("split"), col("source"))
    sources.Sources.writeParquet(out, s"$outPath/corpus",
      partitionCols = Seq("split", "source"))
    // counts from what was actually WRITTEN, not from the plan; seeded
    // with every expected split so a split filtered to zero docs is
    // recorded as 0, not absent (consumers can't otherwise distinguish
    // "empty split" from "no such split")
    val counts = Map("train" -> 0L, "val" -> 0L, "test" -> 0L) ++
      spark.read.parquet(s"$outPath/corpus")
        .groupBy("split").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val manifest = counts.toSeq.sortBy(_._1)
      .map { case (s, n) => s""""$s":$n""" }.mkString("{", ",", "}")
    Files.write(Paths.get(s"$outPath/manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    counts
  }

  /** Read one split back with partition pruning (the consumer-side call). */
  def readSplit(spark: SparkSession, outPath: String, split: String): DataFrame =
    spark.read.parquet(s"$outPath/corpus").filter(col("split") === split)

  /** The clean-corpus run — the CCNet/Dolma-shaped composition that
    * actually TRANSFORMS the text, in pipeline order, and writes the
    * result a tokenizer job consumes:
    *
    *  1. **Scrub** (the q110 redaction, no fixture injection — the corpus
    *     as-is): emails/IPs/phone lines → typed placeholders, so nothing
    *     downstream ever sees raw PII;
    *  2. **Window purge** (the q111 keeper rule over the SCRUBBED token
    *     stream): every duplicate non-overlapping window drops, first
    *     occurrence corpus-wide survives;
    *  3. **Survivor filter** (the q81 verdict): train keeps only deduped
    *     + quality-passed + decontaminated docs; val/test keep full
    *     hash-split membership (eval sets are sacred);
    *  4. **Write** partitioned by (split, source) with a stage-level
    *     manifest: docs in/out, PII hits redacted, windows dropped,
    *     tokens written — the numbers a data card reports.
    *
    * Output text is the canonical tokenized form (lowercased, cleaned,
    * space-joined — what the purge grain is defined over and what a
    * tokenizer consumes); docs whose every window was a duplicate write
    * an empty text rather than vanish, so corpus accounting stays
    * one-row-per-surviving-doc. Scale shape: the scrub is map-side; the
    * purge moves hashes + drop lists, not text (TextAnalysis.purgeCore);
    * the verdict join is doc_id-keyed; text is written once.
    */
  def cleanCorpus(spark: SparkSession, dir: String, outPath: String): Map[String, Long] = {
    // persisted once (the rawTokens idiom): the scrub regexes and the
    // tokenize each run ONE corpus pass — purgeCore reads toks twice
    // (window explode + rebuild join) and the final join reads the
    // scrubbed metadata again, all off the materialized relations
    // (review finding: unpersisted, the 6-regex scrub re-ran 3-4×)
    val scrubbed = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        TextAnalysis.piiRedactCol(col("text")).as("text"),
        TextAnalysis.piiHitsCol(col("text")).as("pii_hits"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = scrubbed.select(col("doc_id"),
      graft.functions.TextFns.tokenize(col("text")).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val purged = TextAnalysis.purgeCore(toks)
      .select(col("doc_id"),
        concat_ws(" ", flatten(col("kept"))).as("clean_text"),
        aggregate(col("kept"), lit(0L), (a, sl) => a + size(sl))
          .as("n_tokens"),
        (size(col("slices")) - size(col("kept"))).cast("long")
          .as("windows_dropped"))
    val verdict = TextAnalysis.trainCorpus(spark, dir)
      .select("doc_id", "split", "train_ok")
    val keep = verdict.filter(
      (col("split") === "train" && col("train_ok") === 1L) ||
        col("split") =!= "train")
    val out = scrubbed.drop("text")
      .join(purged, Seq("doc_id"))
      .join(keep, Seq("doc_id"))
      .select(col("doc_id"), col("clean_text"), col("lang"), col("n_tokens"),
        col("pii_hits"), col("windows_dropped"), col("split"), col("source"))
    sources.Sources.writeParquet(out, s"$outPath/corpus",
      partitionCols = Seq("split", "source"))
    // stage-level counts from what was actually WRITTEN
    val w = spark.read.parquet(s"$outPath/corpus")
    val Seq(nDocs, nTok, nPii, nWin) = w.agg(count(lit(1)),
      sum("n_tokens"), sum("pii_hits"), sum("windows_dropped"))
      .collect().head.toSeq.map(v => v.asInstanceOf[Long]).toSeq
    val counts = Map(
      "docs_in" -> scrubbed.count(),
      "docs_written" -> nDocs, "tokens_written" -> nTok,
      "pii_hits_redacted" -> nPii, "windows_dropped" -> nWin)
    val manifest = counts.toSeq.sortBy(_._1)
      .map { case (s, n) => s""""$s":$n""" }.mkString("{", ",", "}")
    Files.write(Paths.get(s"$outPath/manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    toks.unpersist()
    scrubbed.unpersist()
    counts
  }

  /** The persisted cross-corpus chunk-hash index (VERDICT r12 #5 — the
    * missing piece of the q113 CCNet story): a deployment does NOT
    * recompute yesterday's corpus hashes per dump (q113 recomputes the
    * even side every run); it keeps `chunk_index.parquet` — one DISTINCT
    * `chunk_hash` per row, the 16-byte-at-scale relation q113's corpus
    * side collapses to — and each day unions today's survivors in.
    *
    * `updateChunkIndex` is that daily step over an arbitrary tokenized
    * dump relation (doc_id, toks): bootstrap (no index yet → the dump's
    * distinct hashes ARE the index) or incremental (stored ∪ dump-new;
    * the stored side is a parquet scan of hashes — no re-tokenization,
    * no text). The purge keeper rule retains exactly one occurrence of
    * every corpus-new hash, so the survivors' hash set IS the dump's
    * distinct-new set — the union needs no purge output. The swap is
    * write-to-sibling then TWO atomic renames (live → .old, .next →
    * live), so the update never deletes a committed index and never
    * overwrites a parquet dir it is lazily reading (the classic Spark
    * self-overwrite trap); a crash at any instant leaves a committed copy
    * at `indexPath` or parked at `.old`, which the next update adopts. A
    * reader can never observe a HALF-WRITTEN index — at most it races the
    * inter-rename instant and sees a missing path, which readChunkIndex
    * absorbs with a bounded retry. A
    * no-new-hashes update (replayed dump, idempotent micro-batch) skips
    * the rewrite entirely — zero index I/O to change nothing.
    *
    * Maintenance contract: ONE writer at a time. The batch job and the
    * streaming indexIngest twin are interchangeable — either may run the
    * next update — but not concurrent: the `.next`/`.old` sibling paths
    * are shared per index, so overlapping writers could clobber each
    * other's temp write or lose one writer's hashes (last-union-wins).
    * Serialize updates (one daily job, or one streaming query whose
    * micro-batches are inherently sequential). The rename-based swap also
    * requires a LOCAL filesystem path (java.nio renames; a scheme-prefixed
    * hdfs://…/s3a://… path would silently target a bogus local file) —
    * enforced below.
    *
    * THIS FORM IS THE FALLBACK, not the default (r15, closing VERDICT
    * r14 #4): the bucketed catalog-table layout
    * ([[updateChunkIndexBucketed]], dispatched by [[maintainChunkIndex]])
    * is the default index path — O(delta) appends instead of this form's
    * O(index) rewrite on every nonzero day, no stored-side shuffle,
    * Hadoop-committer commits (hdfs://s3a:// safe), bucket-pruned point
    * probes, crash-safe compaction. Use the rename form only where no
    * catalog (even the in-memory session one) can own a table and the
    * index lives on a local filesystem. The two layouts are proven
    * result-interchangeable by BucketedIndexSpec's seeded randomized
    * differential.
    *
    * Scale shape: one distinct over dump hashes + one hash anti-join
    * against the stored scan; both sides are 16-byte keys, text never
    * moves. At 100 TB the index is a few billion rows of fixed-width
    * hashes — a bucketed-by-hash layout keeps the daily union a
    * co-partitioned merge; here the single-parquet-dir form keeps the
    * same plan at local scale.
    */
  def updateChunkIndex(spark: SparkSession, dump: DataFrame,
      indexPath: String,
      width: Int = TextAnalysis.ChunkWidth): Map[String, Long] = {
    requireLocalPath(indexPath)
    val dumpHashes = TextAnalysis.chunksOf(dump, width, 0)
      .select("chunk_hash").distinct()
    // crash recovery (review r13): a death between the two swap renames
    // below leaves the finished index parked at .old — adopt it before
    // deciding bootstrap-vs-incremental, so no committed hash is ever lost
    val old = Paths.get(indexPath + ".old")
    if (!Files.exists(Paths.get(indexPath, "_SUCCESS")) &&
        Files.exists(old.resolve("_SUCCESS")))
      Files.move(old, Paths.get(indexPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val stored = Files.exists(Paths.get(indexPath, "_SUCCESS"))
    if (!stored) {
      // bootstrap: the dump's distinct hashes ARE the index
      val tmp = indexPath + ".next"
      sources.Sources.writeParquet(dumpHashes, tmp)
      deleteDir(indexPath) // no _SUCCESS ⇒ nothing committed lives here
      Files.move(Paths.get(tmp), Paths.get(indexPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val n = readChunkIndex(spark, indexPath).count()
      return Map("hashes_before" -> 0L, "hashes_added" -> n,
        "hashes_after" -> n)
    }
    val before = readChunkIndex(spark, indexPath)
    val nBefore = before.count()
    // count the NEW hashes once from the materialized anti-join — and when
    // a replayed/duplicate dump contributes nothing, skip the rewrite
    // entirely: at the billion-row scale shape an idempotent micro-batch
    // must not pay O(index) I/O to change nothing (review r13; the old
    // form also re-scanned the store post-swap just to derive the counts)
    val newOnly = dumpHashes.join(before, Seq("chunk_hash"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nAdded = newOnly.count()
      if (nAdded > 0L) {
        val tmp = indexPath + ".next"
        sources.Sources.writeParquet(before.union(newOnly), tmp)
        // materialized; swap via two atomic renames (never delete the live
        // committed index): park old, promote next, then drop the parked
        // copy. A reader racing the instant between the renames retries a
        // missing path; it can never observe a HALF-WRITTEN index, and a
        // crash at any point leaves a committed copy at indexPath or .old
        // (adopted by the recovery step above on the next update).
        deleteDir(indexPath + ".old")
        Files.move(Paths.get(indexPath), old,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Files.move(Paths.get(tmp), Paths.get(indexPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        deleteDir(indexPath + ".old")
      }
      Map("hashes_before" -> nBefore, "hashes_added" -> nAdded,
        "hashes_after" -> (nBefore + nAdded))
    } finally { newOnly.unpersist(); () }
  }

  /** Default catalog table name of the maintained chunk index. */
  val DefaultChunkIndexTable = "graft_chunk_index"

  /** THE index-maintenance entry point (r15): dispatches to the DEFAULT
    * bucketed catalog layout — [[updateChunkIndexBucketed]], with its
    * append-shaped deltas, shuffle-free stored side, and crash-safe
    * lifecycle (probe/compact/adopt) — unless `table` is empty, which
    * selects the catalog-free rename-swap fallback
    * ([[updateChunkIndex]], single parquet dir, LOCAL filesystem only).
    * Streaming twin: [[graft.streaming.StreamingOps.indexIngestBucketed]]
    * (default) / `indexIngest` (fallback). Same single-writer contract
    * either way.
    */
  def maintainChunkIndex(spark: SparkSession, dump: DataFrame, path: String,
      table: String = DefaultChunkIndexTable,
      buckets: Int = ChunkIndexBuckets,
      width: Int = TextAnalysis.ChunkWidth): Map[String, Long] =
    if (table.isEmpty) updateChunkIndex(spark, dump, path, width)
    else updateChunkIndexBucketed(spark, dump, table, path, buckets, width)

  /** Read the stored index with its schema declared explicitly — an
    * all-filtered-out dump writes a parquet dir with no part files, and
    * schema inference over it would fail where a declared schema reads
    * zero rows (the empty-corpus totality case).
    *
    * Bounded retry on a missing path: a reader racing the inter-rename
    * instant of updateChunkIndex's swap sees no committed dir for a few
    * milliseconds — absorb it here (advice r13: the docstring promised
    * the retry; now the reader implements it). Only MISSING-PATH
    * failures retry (advice r14): a permission error or corrupt dir is
    * not the rename race and rethrows immediately — the bounded backoff
    * must not mask a different error class for ~375 ms. A path still
    * missing after the retries is a real absent index and throws as
    * before.
    */
  def readChunkIndex(spark: SparkSession, indexPath: String): DataFrame = {
    def read(): DataFrame = {
      val df = spark.read.schema("chunk_hash STRING").parquet(indexPath)
      df.queryExecution.analyzed // force path resolution NOW, not lazily
      df
    }
    // the inter-rename race surfaces as FileNotFoundException or an
    // AnalysisException in the PATH_NOT_FOUND condition, sometimes
    // wrapped — walk the cause chain for either shape
    @annotation.tailrec
    def isMissingPath(e: Throwable): Boolean = e match {
      case null => false
      case _: java.io.FileNotFoundException => true
      case a: org.apache.spark.sql.AnalysisException
          if a.getCondition == "PATH_NOT_FOUND" => true
      case other => isMissingPath(other.getCause)
    }
    @annotation.tailrec
    def attempt(retriesLeft: Int, backoffMs: Long): DataFrame =
      scala.util.Try(read()) match {
        case scala.util.Success(df) => df
        case scala.util.Failure(e) =>
          if (retriesLeft == 0 || !isMissingPath(e)) throw e
          Thread.sleep(backoffMs)
          attempt(retriesLeft - 1, backoffMs * 2)
      }
    attempt(retriesLeft = 4, backoffMs = 25L)
  }

  /** Bucket count of the bucketed index layout. 32 matches the local
    * sessions' shuffle.partitions so the dump side's one exchange lands
    * at full parallelism; at deployment scale set it once at bootstrap
    * from the projected index size (buckets ≈ index_bytes / 128 MB) —
    * the count is fixed for the table's lifetime (every appended file
    * must agree on the hash modulus).
    */
  val ChunkIndexBuckets = 32

  /** The bucketed-by-hash physical layout of the persisted chunk index
    * (VERDICT r13 #1): the index lives as a catalog table bucketed by
    * `chunk_hash` (Sources.writeBucketed), so the daily incremental
    * update is APPEND-shaped and the stored side never shuffles:
    *
    *  - the anti-join reads the bucketed scan, whose output partitioning
    *    IS the join's required HashPartitioning(chunk_hash, buckets) —
    *    no Exchange on the stored side; only today's (distinct-hash,
    *    16-byte-key) dump side shuffles to the bucket modulus (plan
    *    evidence in PLANS.md §chunk-index);
    *  - a nonzero delta APPENDS delta-sized bucket files to the table
    *    (Spark bucketed reads union all files of bucket i into task i),
    *    so daily write I/O is O(new hashes), not O(index) — vs the
    *    rename-swap form, which rewrites the full index on any delta;
    *  - commits ride the Hadoop output committer (scheme-agnostic: works
    *    on hdfs://, file://; no java.nio renames), staging under
    *    _temporary until job commit. A crashed append leaves the table
    *    unchanged; the RETRY recomputes the anti-join against the
    *    possibly-updated store, so a replayed update appends exactly the
    *    still-missing hashes — idempotent at the job level, same
    *    single-writer-at-a-time contract as the rename form.
    *
    * The table is registered in the session catalog (in-memory here, a
    * metastore in deployment); if the catalog forgot the table (new
    * session) but committed bucket files exist at `path`, the update
    * re-registers the table from the existing data — catalog loss must
    * not truncate the index. The bucket COUNT for that re-registration
    * comes from the `_graft_bucket_spec` sidecar written at every
    * bootstrap/compaction rewrite, NOT from this call's `buckets`
    * parameter: a caller passing a different count than the files were
    * written with would silently break the scan's HashPartitioning
    * assumption (the anti-join would miss stored hashes and re-append
    * them). Appends are safe either way — Spark rejects a bucketBy that
    * disagrees with the existing table's spec.
    *
    * Entry also adjudicates a leftover committed `.compact-staging`
    * anchor (r14 review): a compaction that died mid-overwrite leaves
    * the latest committed index ONLY at the anchor — without this check
    * the update would adopt the truncated on-disk subset (or bootstrap
    * from today's dump alone) and the index would silently forget
    * hashes, then later appends would push the table count above the
    * anchor's and the next compaction would delete the only surviving
    * copy.
    */
  def updateChunkIndexBucketed(spark: SparkSession, dump: DataFrame,
      table: String, path: String,
      buckets: Int = ChunkIndexBuckets,
      width: Int = TextAnalysis.ChunkWidth): Map[String, Long] = {
    def t[A](tag: String)(f: => A): A =
      if (!sys.env.contains("GRAFT_Q116_DEBUG")) f
      else {
        val t0 = System.nanoTime()
        val r = f
        println(f"[q116-u] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
    val dumpHashes = TextAnalysis.chunksOf(dump, width, 0)
      .select("chunk_hash").distinct()
    t("adopt")(adoptCompactStagingIfNewer(spark, table, path, buckets))
    // the EFFECTIVE bucket count: the sidecar (what the files were
    // written with) wins over the parameter everywhere past bootstrap —
    // adoption AND appends — so a caller's mismatched count can neither
    // mis-declare the layout nor fail the append
    val b = t("readspec")(readBucketSpec(spark, path)).getOrElse(buckets)
    t("recover")(recoverCatalogIfCommitted(spark, table, path, b))
    // Measured r22 and REJECTED: repartition(b, chunk_hash) before each
    // write (one file per bucket per batch, §6 small-files shape). AQE
    // already coalesces these writes to 1–4 tasks at bench scale, so the
    // aligned exchange only added a stage + b tasks per write — QProbe
    // q116 2.28–2.44 → 2.62–3.04 s (appends 0.30–0.32 → 0.33–0.45 s).
    // At deployment scale the same alignment IS the right write shape,
    // but it should come from AQE advisory sizing over a real-sized dump,
    // not a hard-coded exchange that taxes the small case.
    if (!t("exists?")(spark.catalog.tableExists(table))) {
      t("bootstrap-write")(sources.Sources.writeBucketed(dumpHashes, table, path, b,
        "chunk_hash", sortCols = Seq("chunk_hash")))
      writeBucketSpec(spark, path, b)
      val n = t("bootstrap-count")(spark.table(table).count())
      return Map("hashes_before" -> 0L, "hashes_added" -> n,
        "hashes_after" -> n)
    }
    val stored = spark.table(table)
    val nBefore = t("count-before")(stored.count())
    val newOnly = dumpHashes.join(stored, Seq("chunk_hash"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nAdded = t("antijoin-count")(newOnly.count())
      if (nAdded > 0L) {
        // delta-sized append: new bucket files only, never a rewrite
        t("append")(newOnly.write.mode("append")
          .bucketBy(b, "chunk_hash").sortBy("chunk_hash")
          .saveAsTable(table))
      }
      Map("hashes_before" -> nBefore, "hashes_added" -> nAdded,
        "hashes_after" -> (nBefore + nAdded))
    } finally { newOnly.unpersist(); () }
  }

  /** Point membership probe of the bucketed index — the "is this chunk
    * already known?" lookup a dedup service answers per incoming hash.
    * The equality filter on the bucket column prunes the read to ONE of
    * `buckets` bucket files (the probeIvf device): at a billion-row
    * index a probe costs one file's worth of I/O, not a table scan. The
    * planner's auto rule can disable bucketed scans when no join needs
    * the distribution, so this method pins
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` around
    * an ISOLATED session (`spark.newSession()` — same SparkContext and
    * shared external catalog, so the table resolves; its own SQL conf),
    * so the caller's session conf is never touched: a save/restore on
    * the shared conf (the r14 shape) raced concurrent planning — any
    * query planned in the probe window was planned with bucketed scans
    * off, and two interleaved probes could leave the flag off
    * permanently (advice r14). The isolated session costs ~ms of
    * session-state setup per probe, amortized by the probe's own file
    * read. BucketedIndexSpec asserts `SelectedBucketsCount: 1` on
    * the probe's plan shape. For BATCHES of hashes use
    * updateChunkIndexBucketed's anti-join shape instead — per-key probes
    * are the low-latency path, not the throughput path.
    */
  def probeChunkIndex(spark: SparkSession, table: String,
      hash: String): Boolean = {
    val probeSession = spark.newSession()
    probeSession.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    !probeSession.table(table)
      .filter(col("chunk_hash") === lit(hash)).isEmpty
  }

  /** Fold the bucketed index's accumulated delta files back to one file
    * per bucket. Daily appends keep update I/O O(delta) but grow
    * files-per-bucket by one generation per nonzero day; after N days a
    * bucket's read is N small files. Compaction is the standard answer:
    * stage the current rows OUT of the table (plain parquet — reading
    * the table while bucketed-overwriting it would be the classic
    * self-overwrite trap), then rewrite the table from the staging copy
    * with the same bucket spec, and drop the staging dir.
    *
    * Contract: a MAINTENANCE-WINDOW op under the index's single-writer
    * rule, and — unlike the incremental update, whose commits readers
    * never observe half-done — the overwrite truncates the table
    * location before rewriting it, so pause readers too (deployments
    * compact in the same window that vacuums old generations; the
    * streaming twin's micro-batches simply pause). Row set is provably
    * unchanged (BucketedIndexSpec: same hash set, files back to
    * `buckets`, subsequent incremental updates unaffected).
    *
    * Crash safety: the staging copy (kept until the rewrite commits) is
    * the recovery anchor. On entry, a leftover committed staging dir is
    * adjudicated by ROW COUNT against the table — sound because the
    * index is append-only (set union, never deletes), so row counts are
    * monotone: staging > table means the previous compaction died
    * mid-overwrite and staging is the latest committed superset (rebuild
    * from it — the recovery); staging ≤ table means the table is current
    * (staging is a stale copy from a compaction that committed but died
    * before cleanup, possibly missing later appends) — restage fresh,
    * NEVER adopt, or those appends would be silently truncated.
    * BucketedIndexSpec exercises both arms.
    */
  def compactChunkIndexBucketed(spark: SparkSession, table: String,
      path: String, buckets: Int = ChunkIndexBuckets): Map[String, Long] = {
    if (adoptCompactStagingIfNewer(spark, table, path, buckets))
      return Map("hashes" -> spark.table(table).count(), "recovered" -> 1L)
    val staging = path + ".compact-staging"
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // catalog loss with committed part- files on disk and no newer staging
    // anchor: the on-disk files ARE the latest committed index — heal the
    // catalog exactly as the incremental update does, so a
    // compaction-first maintenance job doesn't abort at the require below
    // on state the update path recovers from (advice r15)
    recoverCatalogIfCommitted(spark, table, path,
      readBucketSpec(spark, path).getOrElse(buckets))
    require(spark.catalog.tableExists(table),
      s"compact: table $table does not exist and no committed staging " +
        s"copy at $staging — nothing to compact")
    spark.table(table).write.mode("overwrite").parquet(staging)
    val stagedDf = spark.read.schema("chunk_hash STRING").parquet(staging)
    val n = stagedDf.count()
    // rewrite at the count the files were WRITTEN with (sidecar wins
    // over the caller's parameter, matching updateChunkIndexBucketed):
    // a default-argument compaction of a table bootstrapped at a
    // non-default count must not silently rewrite the physical layout
    // the bootstrap sized for the table's lifetime (advice r14)
    val b = readBucketSpec(spark, path).getOrElse(buckets)
    sources.Sources.writeBucketed(stagedDf, table, path, b,
      "chunk_hash", sortCols = Seq("chunk_hash"))
    writeBucketSpec(spark, path, b)
    // staging is deleted only AFTER the rewrite commits — a crash at any
    // earlier instant leaves it as the recovery anchor
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    Map("hashes" -> n, "recovered" -> 0L)
  }

  /** The shared catalog-loss recovery arm (advice r15): if the table is
    * unregistered but committed part- files exist at `path`, adopt them as
    * the table via CREATE TABLE ... LOCATION at the bucket count they were
    * WRITTEN with (callers pass the sidecar-resolved count). Runs at the
    * head of both the incremental update and the compaction, so whichever
    * maintenance job runs first after a metastore loss heals the index.
    * No-op when the table exists or nothing is committed on disk.
    */
  private def recoverCatalogIfCommitted(spark: SparkSession, table: String,
      path: String, buckets: Int): Unit = {
    if (spark.catalog.tableExists(table)) return
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("part-"))
    if (committed) {
      spark.sql(s"CREATE TABLE $table (chunk_hash STRING) USING parquet " +
        s"CLUSTERED BY (chunk_hash) SORTED BY (chunk_hash) INTO $buckets BUCKETS " +
        s"LOCATION '$path'")
      ()
    }
  }

  /** The shared crash-recovery arm: if a committed `.compact-staging`
    * anchor holds MORE rows than the table (append-only counts are
    * monotone, so strictly-more means the last compaction died between
    * staging and its rewrite's commit), rebuild the table from the
    * anchor and clean it up. A smaller-or-equal anchor is a stale copy
    * from a compaction that committed but died before cleanup — left in
    * place (harmless; the next compaction restages over it), NEVER
    * adopted. Runs at the head of every bucketed update and compaction,
    * so the first serialized writer after the crash heals the index
    * whichever job it is.
    */
  private def adoptCompactStagingIfNewer(spark: SparkSession, table: String,
      path: String, buckets: Int): Boolean = {
    val staging = path + ".compact-staging"
    val sp = new org.apache.hadoop.fs.Path(staging)
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS")))
      return false
    val stagedDf = spark.read.schema("chunk_hash STRING").parquet(staging)
    // Adjudicate against the COMMITTED DATA, not the catalog: after a
    // catalog loss the table is unregistered but its bucket files are
    // still the latest committed index — counting them as -1 would let a
    // STALE anchor (a compaction that committed, then died before
    // cleanup, then saw more appends) win and truncate every
    // post-compaction append (advice r14). The on-disk part- files are
    // the ground truth the anchor must beat.
    val tableRows =
      if (spark.catalog.tableExists(table)) spark.table(table).count()
      else {
        val p = new org.apache.hadoop.fs.Path(path)
        val pfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val committed = pfs.exists(p) &&
          pfs.listStatus(p).exists(_.getPath.getName.startsWith("part-"))
        if (committed)
          spark.read.schema("chunk_hash STRING").parquet(path).count()
        else -1L
      }
    if (stagedDf.count() <= tableRows) return false
    val b = readBucketSpec(spark, path).getOrElse(buckets)
    sources.Sources.writeBucketed(stagedDf, table, path, b,
      "chunk_hash", sortCols = Seq("chunk_hash"))
    writeBucketSpec(spark, path, b)
    fs.delete(sp, true)
    true
  }

  /** Sidecar recording the bucket count the index files were WRITTEN
    * with — read back by catalog-loss adoption so a caller's mismatched
    * `buckets` parameter can't mis-declare the table's physical layout
    * (r14 review). Written AFTER the bucketed write commits; absent on
    * pre-r14 indexes, where adoption falls back to the parameter.
    */
  private val BucketSpecFile = "_graft_bucket_spec"

  private def writeBucketSpec(spark: SparkSession, path: String,
      buckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, BucketSpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(buckets.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readBucketSpec(spark: SparkSession, path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(path, BucketSpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        .trim.toIntOption
      finally in.close()
    }
  }

  /** The rename-based swap runs on java.nio, which resolves raw strings
    * against the LOCAL filesystem — a scheme-prefixed hdfs://…/s3a://…
    * path would make the parquet write land remote while the renames
    * operate on a bogus local path, silently breaking the never-lose-a-
    * committed-index guarantee (advice r13). Reject it loudly; the
    * bucketed catalog-table form is the distributed-FS shape.
    */
  private def requireLocalPath(indexPath: String): Unit =
    require(!indexPath.contains("://"),
      s"updateChunkIndex's rename swap requires a local-filesystem path; " +
        s"got '$indexPath'. On hdfs://s3a:// use updateChunkIndexBucketed " +
        s"(Hadoop-committer writes, no renames).")

  private def deleteDir(path: String): Unit = {
    val target = Paths.get(path)
    if (Files.exists(target)) {
      import scala.jdk.CollectionConverters._
      Files.walk(target).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
  }

  /** q114 — the stored-index round-trip as an oracle-checked query: wipe,
    * bootstrap the index from the even (corpus) parity side, incrementally
    * union the odd (dump) side's hashes — BOTH updateChunkIndex paths —
    * then summarize the STORED parquet by leading-nibble bucket: count,
    * min/max hash, and a commutative checksum (sum of each hash's
    * first-8-nibble value — order-independent, constant aggregation
    * state, the scale-shaped digest; a sorted collect_list digest would
    * not survive a billion-row bucket). The oracle recomputes the same
    * summary INDEPENDENTLY from the raw documents table via the shared
    * window-geometry CTEs, so a green hash proves the artifact on disk
    * is exactly the corpus's distinct chunk-hash set — storage round-trip
    * and index math in one check.
    */
  def chunkIndexBuckets(spark: SparkSession, dir: String): DataFrame = {
    val idx = ChunkIndexPath(spark, dir)
    deleteChunkIndex(idx)
    val all = TextAnalysis.rawTokens(spark, dir)
    updateChunkIndex(spark, all.where(col("doc_id") % 2 === 0), idx)
    updateChunkIndex(spark, all.where(col("doc_id") % 2 === 1), idx)
    readChunkIndex(spark, idx)
      .withColumn("bucket", substring(col("chunk_hash"), 1, 1))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_hashes"),
        min("chunk_hash").as("min_hash"),
        max("chunk_hash").as("max_hash"),
        // first-8-nibble (32-bit) values: the long sum is overflow-safe
        // to 2^30 rows per bucket (13 nibbles would wrap at ~2^11)
        sum(expr("cast(conv(substring(chunk_hash, 1, 8), 16, 10) as bigint)"))
          .as("bucket_sum"))
      .orderBy("bucket")
  }

  /** q116 — the BUCKETED stored-index round-trip as an oracle-checked
    * query (the q114 shape over the deployment layout): wipe, bootstrap
    * the bucketed catalog table from the doc_id%3==0 third of the corpus,
    * then TWO incremental appends (%3==1, %3==2 — two delta-shaped
    * updates, so the summarized table is bootstrap files + two appended
    * file generations per bucket), then summarize the STORED table by
    * leading nibble. Two commutative digests — the first-8-nibble sum
    * (q114's) plus a LAST-8-nibble sum — so a q114/q116 copy-paste slip
    * can't cross-pass, and both survive billion-row buckets (constant
    * aggregation state, order-independent). The oracle recomputes both
    * INDEPENDENTLY from the documents table via the shared window
    * geometry: a green hash proves the bucketed, thrice-appended table
    * holds exactly the corpus's distinct chunk-hash set.
    */
  def chunkIndexBucketedSummary(spark: SparkSession, dir: String): DataFrame = {
    val (table, path) = BucketedChunkIndexLocation(spark, dir)
    def t[A](tag: String)(f: => A): A =
      if (!sys.env.contains("GRAFT_Q116_DEBUG")) f
      else {
        val t0 = System.nanoTime()
        val r = f
        println(f"[q116] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
    t("delete")(deleteBucketedChunkIndex(spark, table, path))
    val all = TextAnalysis.rawTokens(spark, dir)
    t("update0")(updateChunkIndexBucketed(spark, all.where(col("doc_id") % 3 === 0), table, path))
    t("update1")(updateChunkIndexBucketed(spark, all.where(col("doc_id") % 3 === 1), table, path))
    t("update2")(updateChunkIndexBucketed(spark, all.where(col("doc_id") % 3 === 2), table, path))
    spark.table(table)
      .withColumn("bucket", substring(col("chunk_hash"), 1, 1))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_hashes"),
        min("chunk_hash").as("min_hash"),
        max("chunk_hash").as("max_hash"),
        sum(expr("cast(conv(substring(chunk_hash, 1, 8), 16, 10) as bigint)"))
          .as("bucket_sum"),
        sum(expr("cast(conv(substring(chunk_hash, 25, 8), 16, 10) as bigint)"))
          .as("bucket_sum_lo"))
      .orderBy("bucket")
  }

  /** (table, path) of q116's per-(session, dir) bucketed index — the
    * ChunkIndexPath convention, plus a catalog-safe table identifier
    * (letters/digits/underscore only).
    */
  def BucketedChunkIndexLocation(spark: SparkSession, dir: String): (String, String) = {
    val path = org.apache.spark.sql.GraftBridge
      .sessionDirPath("graft-chunk-index-bucketed", spark, dir)
    val key = path.substring(path.lastIndexOf('/') + 1)
    ("graft_chunk_idx_" + key.replaceAll("[^A-Za-z0-9]", "_"), path)
  }

  /** Drop q116's bucketed index table AND its data dir (the
    * deleteChunkIndex analogue — forces the bootstrap path).
    */
  def deleteBucketedChunkIndex(spark: SparkSession, table: String,
      path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    deleteDir(path)
  }

  /** Where q114 keeps its per-corpus index artifact. Keyed by
    * (session, dir) like every graft cache (CLAUDE.md): q114 WIPES and
    * rebuilds its default-location index per call, so two concurrent
    * sessions on the same sfDir (Verify racing Bench, parallel test JVMs)
    * would interleave wipe/bootstrap/update on a dir-only key and corrupt
    * each other's round-trip. An md5 of the RAW dir string rides along so
    * distinct dirs that sanitize identically ('/a/b' vs '/a_b') cannot
    * collide. Deployments that want a long-lived shared index pass their
    * own explicit indexPath to updateChunkIndex instead.
    */
  def ChunkIndexPath(spark: SparkSession, dir: String): String =
    org.apache.spark.sql.GraftBridge
      .sessionDirPath("graft-chunk-index", spark, dir) + "-" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Wipe a stored index (and any half-written sibling) — the smoke/test
    * hook for forcing the bootstrap path deterministically.
    */
  def deleteChunkIndex(indexPath: String): Unit = {
    deleteDir(indexPath); deleteDir(indexPath + ".next")
    deleteDir(indexPath + ".old")
  }

  /** Dir-convenience form: today's dump is the corpus at `dir`. */
  def updateChunkIndex(spark: SparkSession, dir: String,
      indexPath: String): Map[String, Long] =
    updateChunkIndex(spark, TextAnalysis.rawTokens(spark, dir), indexPath)

  /** Windows per output shard of [[materializePacked]]. 8 windows ×
    * 2048 tokens ≈ 16k tokens per shard — sized so the tests' corpora
    * span several shards (the oracle digest then localizes per shard); a
    * deployment sets it once from the loader's shard-file budget
    * (windowsPerShard ≈ shard_bytes / (capacity × bytes_per_token)) and
    * the shard id is a pure function of the window id, so
    * re-materializing with the same setting is reproducible.
    */
  val PackedWindowsPerShard = 8L

  /** Materialize packed window CONTENTS — the loader-ready shard artifact
    * (VERDICT r17 item 2): q120/q122/q123 produce the placement/composition
    * MAP; this writes the windows themselves — one row per context window
    * with its packed token stream and the per-segment boundary metadata an
    * attention-mask builder consumes — partitioned by shard so a loader
    * reads its shard files with directory-level pruning.
    *
    * Output rows: (win, shard, n_segs, tokens, segments) where `tokens`
    * is the window's full token sequence (capacity-long except the final
    * partial window) and `segments` is the ordered boundary list
    * (doc_id, win_off, seg_len, is_head, is_tail) — exactly the q122 map
    * rows for this window, so mask construction needs no second join.
    *
    * Scale shape: segments come from the STORED placement artifact
    * ([[graft.operators.Packing.storedPlacement]] — the committed index,
    * not a corpus re-sort); the one corpus-sized join is doc_id-keyed
    * (segments ⨝ cached ordered tokens), each doc's token slices are cut
    * map-side, and the window assembly is ONE partial-aggregated
    * groupBy(win) whose state is bounded by the window capacity (a window
    * holds ≤ capacity tokens by construction, whatever the corpus size).
    * Tokens move exactly once — unavoidable: they are the artifact.
    * Reconstruction (windows re-concatenate to the corpus token stream)
    * is pinned by PackingSpec; the on-disk digest is oracle-checked by
    * q124.
    */
  def materializePacked(spark: SparkSession, dir: String, outPath: String,
      windowsPerShard: Long = PackedWindowsPerShard): Map[String, Long] = {
    import graft.operators.Packing
    // the stored artifact's capacity is FIXED at ContextTokens (advice
    // r19: this form used to take a capacity parameter it silently did
    // not honor — the stored bootstrap always writes ContextTokens, so a
    // non-default value would have sheared segment geometry); the require
    // still verifies the sidecar in case the -stored index was built by
    // other means
    val p = Packing.storedPlacement(spark, dir)
    Packing.requireIndexCapacity(spark,
      Packing.PackingIndexPath(spark, dir) + "-stored",
      Packing.ContextTokens)
    val segs = Packing.segmentsOf(p, Packing.ContextTokens)
    writePackedWindows(spark, dir, segs, outPath, windowsPerShard,
      dynamic = false)
  }

  /** [[materializePacked]] reading an EXPLICIT stored index instead of the
    * session-cached full-corpus one — the deployment form: the artifact is
    * (re)built from whatever the committed placement index holds, so a
    * bootstrap-then-append index materializes its prefix artifact before
    * the append arrives ([[appendPackedShards]] then extends it O(batch)).
    */
  def materializePackedFrom(spark: SparkSession, dir: String,
      indexPath: String, outPath: String,
      capacity: Long = graft.operators.Packing.ContextTokens,
      windowsPerShard: Long = PackedWindowsPerShard): Map[String, Long] = {
    import graft.operators.Packing
    Packing.requireIndexCapacity(spark, indexPath, capacity)
    val segs = Packing.segmentsOf(
      Packing.readPackingIndex(spark, indexPath), capacity)
    writePackedWindows(spark, dir, segs, outPath, windowsPerShard,
      dynamic = false)
  }

  /** Extend a packed-shard artifact after a packing-index append WITHOUT
    * re-materializing the corpus (the q121 O(batch) posture applied to the
    * artifact itself): an append only changes windows from the first one
    * the new batch touches — the stored token total's window (possibly
    * partial, now continued by the new docs) and everything after — so
    * only the shards holding those windows are rewritten, via dynamic
    * partition overwrite (untouched shard dirs are never listed, read, or
    * replaced).
    *
    * Mechanics: the rebuild floor is rounded DOWN to a shard boundary
    * (the first dirty shard may hold clean windows, and a partition
    * overwrite replaces whole shards); the placement rows feeding it are
    * `last_win >= rebuildFromWin` — the appended batch plus at most the
    * earlier tail docs that straddle into the dirty region, found by a
    * parquet-stats-pruned scan of the 48-byte/doc index (never the
    * corpus); their token slices re-join the cached ordered-token
    * relation at doc grain. Work and write are both O(batch + one
    * shard). Equivalence to a full re-materialization is pinned by
    * PackingSpec; the rung is timed in ScaleSmoke next to q121's.
    * Shard dirs beyond the index's committed last window are DELETED
    * (r19): after a truncate + smaller re-append (the re-pack procedure)
    * the pre-truncate artifact's trailing shards are dead data, and
    * leaving them would serve stale windows to a range read past the new
    * end — the one seam VERDICT r18 found in the maintenance story. A
    * PURE truncation (nothing re-appended) repairs the same way through
    * the empty-batch arm: call this with the truncated batch number and,
    * when the artifact holds more tokens than the committed index, the
    * boundary shard is rebuilt from the index and the trailing dirs
    * pruned.
    *
    * Contract: same single-writer rule as the index; `batch` is the batch
    * number the corresponding [[graft.operators.Packing.updatePackingIndex]]
    * returned (an exactly-replayed append may pass the same number again —
    * the rewrite is idempotent).
    */
  def appendPackedShards(spark: SparkSession, dir: String, indexPath: String,
      outPath: String, batch: Long,
      capacity: Long = graft.operators.Packing.ContextTokens,
      windowsPerShard: Long = PackedWindowsPerShard): Map[String, Long] = {
    require(windowsPerShard > 0, "windowsPerShard must be positive")
    // the shard id is a pure function of (win, windowsPerShard), so a
    // call with a different setting than the artifact was WRITTEN with
    // would compute wrong dirty/stale shard boundaries — and the
    // trailing-shard prune would DELETE valid data (advice r19). The
    // written setting rides the manifest; refuse a mismatch outright
    // (a pre-r20 manifest without the key has nothing to verify against)
    manifestWindowsPerShard(outPath).foreach(recorded =>
      require(recorded == windowsPerShard,
        s"packed-shard artifact at $outPath was written with " +
          s"windows_per_shard=$recorded but this call passed " +
          s"$windowsPerShard — re-materialize instead of appending with " +
          s"mismatched shard geometry"))
    import graft.operators.Packing
    Packing.requireIndexCapacity(spark, indexPath, capacity)
    val idx = Packing.readPackingIndex(spark, indexPath)
    // the index's COMMITTED last window names the artifact's TRUE last
    // shard — computed up front because every arm needs it: any on-disk
    // shard dir beyond it is stale by definition. The reachable cases are
    // a truncate + SMALLER re-append (the re-pack procedure) and a PURE
    // truncation with nothing to re-append (which reaches the artifact
    // through the no-op arm below — review r19); in both, the
    // pre-truncate artifact extends past the corrected corpus and a
    // range read past the new end would return the dead windows
    // (verdict r18's one undocumented seam).
    val end = idx.agg(max("last_win"), coalesce(sum("n_toks"), lit(0L))).head()
    val lastShard = if (end.isNullAt(0)) -1L else end.getLong(0) / windowsPerShard
    // one shared rebuild tail: replace every shard from firstDirtyWin's
    // on, then prune dirs beyond the committed end
    def rebuildFrom(firstDirtyWin: Long): Map[String, Long] = {
      val rebuildFromWin = (firstDirtyWin / windowsPerShard) * windowsPerShard
      val dirty = idx.filter(col("last_win") >= rebuildFromWin)
      // doc_ids are monotone with stream position, so the dirty docs are
      // a contiguous SUFFIX — bound the token side by min(dirty doc_id)
      // and the join scans O(batch) docs instead of the whole cached
      // corpus (the r18 200× rung measured the unbounded scan as the
      // extension leg's dominant cost: ~18 s of reading 1M docs' token
      // arrays to serve 138 windows)
      val minDirtyDoc = dirty.agg(min("doc_id")).head().getLong(0)
      val segs = Packing.segmentsOf(dirty, capacity)
        .filter(col("win") >= rebuildFromWin)
      val counts = writePackedWindows(spark, dir, segs, outPath,
        windowsPerShard, dynamic = true, docsFrom = Some(minDirtyDoc),
        truncateShardsBeyond = Some(lastShard))
      Map("windows_rewritten" -> counts("windows_delta"),
        "shards_rewritten" -> counts("shards_delta"),
        "rebuild_from_win" -> rebuildFromWin) ++ counts
    }
    val fw = idx.filter(col("batch") === batch)
      .agg(min("first_win")).head()
    if (fw.isNullAt(0)) {
      // empty/unknown batch. If the on-disk artifact holds MORE tokens
      // than the committed index, this is the PURE-truncation repair
      // path (review r19: truncate the index, then call this with the
      // truncated batch number): pruning trailing dirs alone is not
      // enough, because the boundary window can straddle the dropped
      // batch — its shard's CONTENT is stale — so rebuild from the
      // committed end's window (the first whose content can differ) and
      // prune the rest. Otherwise a clean no-op that reports the
      // artifact's manifest counts (callers index the same keys on every
      // arm — review r18). An EMPTY index repairs nothing — there is no
      // committed end to rebuild to; wipe + re-materialize is the
      // documented reset there.
      val current = packedArtifactCounts(spark, outPath)
      if (!end.isNullAt(0) && current("tokens_written") > end.getLong(1))
        return rebuildFrom(end.getLong(0))
      return current ++
        Map("windows_rewritten" -> 0L, "shards_rewritten" -> 0L,
          "windows_delta" -> 0L, "shards_delta" -> 0L,
          "rebuild_from_win" -> -1L)
    }
    rebuildFrom(fw.getLong(0))
  }

  /** Shared window assembly + write + manifest of the packed-shard forms:
    * token slices cut map-side from the doc-grain join, ONE
    * capacity-bounded groupBy(win), shard-partitioned write — full
    * overwrite for (re)materialization, DYNAMIC partition overwrite for
    * the incremental append (only the shards present in `segs` are
    * replaced). The manifest is always re-derived from the artifact as
    * WRITTEN (reading the committed files, the materialize convention).
    */
  private def writePackedWindows(spark: SparkSession, dir: String,
      segs: DataFrame, outPath: String, windowsPerShard: Long,
      dynamic: Boolean, docsFrom: Option[Long] = None,
      truncateShardsBeyond: Option[Long] = None): Map[String, Long] = {
    require(windowsPerShard > 0, "windowsPerShard must be positive")
    val toks = docsFrom.foldLeft(TextAnalysis.rawTokens(spark, dir))(
      (t, m) => t.filter(col("doc_id") >= m))
    val segTok = segs.join(toks, Seq("doc_id"))
      .select(col("win"), col("win_off"), col("doc_id"), col("seg_len"),
        col("is_head"), col("is_tail"),
        slice(col("toks"), (col("doc_off") + lit(1L)).cast("int"),
          col("seg_len").cast("int")).as("seg"))
    val windows = segTok.groupBy("win")
      .agg(sort_array(collect_list(struct(
        col("win_off"), col("doc_id"), col("seg_len"),
        col("is_head"), col("is_tail"), col("seg")))).as("parts"))
      .select(col("win"),
        expr(s"win div $windowsPerShard").as("shard"),
        size(col("parts")).cast("long").as("n_segs"),
        flatten(col("parts.seg")).as("tokens"),
        transform(col("parts"), p => struct(
          p.getField("doc_id").as("doc_id"),
          p.getField("win_off").as("win_off"),
          p.getField("seg_len").as("seg_len"),
          p.getField("is_head").as("is_head"),
          p.getField("is_tail").as("is_tail"))).as("segments"))
      // per-window token count as its OWN column: the manifest recount
      // (and any consumer sizing work) reads two long columns instead of
      // decoding the token arrays — at 200× the full-column recount was
      // the extension leg's dominant cost (17 s, r18 rung)
      .withColumn("n_toks", size(col("tokens")).cast("long"))
    val deltaRows =
      if (!dynamic) {
        sources.Sources.writeParquet(windows, s"$outPath/windows",
          partitionCols = Seq("shard"))
        None
      } else {
        // dynamic partition overwrite: only the shard dirs present in the
        // delta are replaced; the write option scopes the mode to THIS
        // write (the session conf stays untouched)
        val d = windows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("shard").parquet(s"$outPath/windows")
        val r = d.agg(count(lit(1)), countDistinct("shard")).head()
        d.unpersist()
        Some((r.getLong(0), r.getLong(1)))
      }
    // drop stale TRAILING shard dirs (the shrinking re-pack seam, verdict
    // r18): a dynamic overwrite replaces only the shard dirs present in
    // the delta, so when the index's committed end moved BACKWARD the
    // pre-truncate artifact's tail dirs would survive and a range read
    // past the new end would return dead windows; the caller passes the
    // index-derived last shard and everything beyond it is deleted BEFORE
    // the manifest recount (which must describe the committed artifact)
    truncateShardsBeyond.foreach(pruneStaleShards(spark, outPath, _))
    val counts = commitManifest(spark, outPath, windowsPerShard)
    counts ++ deltaRows.map { case (wn, sn) =>
      Map("windows_delta" -> wn, "shards_delta" -> sn) }.getOrElse(Map.empty)
  }

  /** The windows-per-shard setting an artifact was WRITTEN with, from its
    * manifest — None for an absent artifact or a pre-r20 manifest without
    * the key (then nothing can be verified against).
    */
  private[graft] def manifestWindowsPerShard(outPath: String): Option[Long] = {
    val mp = Paths.get(s"$outPath/manifest.json")
    if (!java.nio.file.Files.exists(mp)) None
    else """"windows_per_shard":(\d+)""".r
      .findFirstMatchIn(new String(java.nio.file.Files.readAllBytes(mp),
        StandardCharsets.UTF_8))
      .map(_.group(1).toLong)
  }

  /** Delete every on-disk shard dir beyond `lastShard` (the committed
    * index's end); absent artifacts are a no-op.
    */
  private def pruneStaleShards(spark: SparkSession, outPath: String,
      lastShard: Long): Unit = {
    val wdir = new org.apache.hadoop.fs.Path(s"$outPath/windows")
    val wfs = wdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (wfs.exists(wdir))
      wfs.listStatus(wdir).foreach { f =>
        val nm = f.getPath.getName
        if (nm.startsWith("shard=") &&
            nm.stripPrefix("shard=").toLongOption.exists(_ > lastShard))
          wfs.delete(f.getPath, true)
      }
  }

  /** Manifest from what is actually ON DISK (the materialize convention),
    * rewritten after any write or prune. `windows_per_shard` — the
    * shard-geometry setting the artifact was written with — rides the
    * manifest (advice r19) so maintenance calls can verify their own
    * setting against it before pruning shard dirs computed from it.
    */
  private def commitManifest(spark: SparkSession, outPath: String,
      windowsPerShard: Long): Map[String, Long] = {
    val counts = packedArtifactCounts(spark, outPath) +
      ("windows_per_shard" -> windowsPerShard)
    val manifest = counts.toSeq.sortBy(_._1)
      .map { case (s, n) => s""""$s":$n""" }.mkString("{", ",", "}")
    Files.write(Paths.get(s"$outPath/manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    counts
  }

  /** The loader's consumer-side read of a packed-shard artifact: the
    * window range [fromWin, toWin] with DIRECTORY-level pruning — the
    * shard id is a pure function of the window id, so the range maps to
    * a shard range and the scan's PartitionFilters skip every other
    * shard dir (the readSplit convention; PackingSpec asserts the pruned
    * plan). A training job reading its assigned window span touches only
    * its own shard files, whatever the artifact's total size.
    * `windowsPerShard` must be the value the artifact was WRITTEN with
    * (recorded in each row's shard column; mismatches would mis-map the
    * range — the manifest's shard count makes a sanity check cheap).
    */
  def readPackedWindows(spark: SparkSession, outPath: String,
      fromWin: Long, toWin: Long,
      windowsPerShard: Long = PackedWindowsPerShard): DataFrame = {
    require(windowsPerShard > 0 && fromWin <= toWin,
      "need windowsPerShard > 0 and a non-empty window range")
    // the read-side twin of appendPackedShards' geometry guard (advice
    // r20): a caller whose windowsPerShard differs from the written
    // geometry would silently prune to the WRONG shard dirs and return
    // wrong/partial windows — verify against the manifest when it records
    // the setting (pre-r20 manifests don't; nothing to verify then)
    manifestWindowsPerShard(outPath).foreach(recorded =>
      require(recorded == windowsPerShard,
        s"readPackedWindows: artifact at $outPath was written with " +
          s"windows_per_shard=$recorded but this call passed " +
          s"$windowsPerShard — shard pruning would read the wrong dirs"))
    spark.read.parquet(s"$outPath/windows")
      .filter(col("shard") >= fromWin / windowsPerShard &&
        col("shard") <= toWin / windowsPerShard) // partition-pruned
      .filter(col("win") >= fromWin && col("win") <= toWin)
  }

  /** Written-artifact manifest counts — read from the committed files; an
    * absent artifact reports zeros.
    */
  private def packedArtifactCounts(spark: SparkSession,
      outPath: String): Map[String, Long] = {
    val wp = new org.apache.hadoop.fs.Path(s"$outPath/windows")
    val fs = wp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(wp))
      return Map("windows_written" -> 0L, "tokens_written" -> 0L,
        "segments_written" -> 0L, "shards_written" -> 0L)
    // metadata columns only — the token arrays are never decoded here
    val r = spark.read.parquet(s"$outPath/windows")
      .agg(count(lit(1)),
        coalesce(sum("n_toks"), lit(0L)),
        coalesce(sum("n_segs"), lit(0L)),
        countDistinct("shard")).head()
    Map("windows_written" -> r.getLong(0), "tokens_written" -> r.getLong(1),
      "segments_written" -> r.getLong(2), "shards_written" -> r.getLong(3))
  }

  /** q124 — the packed-shard round-trip as an oracle-checked query (the
    * q114 stored-artifact pattern): wipe, materialize the loader shards,
    * then summarize the WRITTEN artifact per shard — window/segment/token
    * counts plus a commutative content digest (sum over windows of the
    * first-8-nibble md5 value of the space-joined window text —
    * order-independent, constant aggregation state, safe at billions of
    * windows per shard). The oracle recomputes the same summary
    * INDEPENDENTLY from the documents table via the shared placement
    * CTEs, slicing each window's text out of the token arrays — a green
    * hash proves the artifact on disk IS the packed corpus token stream,
    * window for window, through the storage round-trip.
    */
  def packedShardDigest(spark: SparkSession, dir: String): DataFrame = {
    val out = PackedShardsPath(spark, dir)
    deleteDir(out)
    materializePacked(spark, dir, out)
    spark.read.parquet(s"$out/windows")
      .select(col("shard").cast("long").as("shard"), col("n_segs"),
        size(col("tokens")).cast("long").as("n_toks"),
        expr("cast(conv(substring(md5(concat_ws(' ', tokens)), 1, 8), 16, 10) as bigint)")
          .as("dig"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_windows"), sum("n_segs").as("n_segs"),
        sum("n_toks").as("n_tokens"), sum("dig").as("win_digest"))
      .orderBy("shard")
  }

  /** Where q124 keeps its per-(session, dir) shard artifact — the
    * ChunkIndexPath convention.
    */
  def PackedShardsPath(spark: SparkSession, dir: String): String =
    org.apache.spark.sql.GraftBridge
      .sessionDirPath("graft-packed-shards", spark, dir)

  /** The reference's ACTUAL program as one library call: materialize the
    * three collections it bulk-writes to MongoDB — enriched wikibook
    * records (main.go:164), the token inverted index (main.go:174), and
    * per-doc compressed token vectors + L2 norms (main.go:238) — through
    * the format-pluggable sink. With the Mongo connector jar on the
    * classpath this IS the reference run (`format = "mongodb"`, collection
    * names in `options`); this container lacks the jar, so tests pin the
    * trio through parquet — same code path, different format string.
    *
    * The three relations share the token hub / dictionary / doc-stats
    * caches, so the corpus is tokenized once, not three times. Returns
    * per-collection row counts, read back from what was actually WRITTEN,
    * and drops them in a manifest next to the data — the reference's
    * implicit contract (three collections from one run) made explicit for
    * downstream consumers.
    */
  def writeReferenceSinks(spark: SparkSession, dir: String, outPath: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Map[String, Long] = {
    import graft.operators.TokenPipeline
    val trio = Seq(
      "wikibooks" -> TokenPipeline.wikibookRecords(spark, dir),
      "tokens" -> TokenPipeline.postings(spark, dir),
      "token_vectors" -> TokenPipeline.tokenVectorMap(spark, dir))
    val counts = trio.map { case (name, df) =>
      sources.Sources.writeFormat(df, format, s"$outPath/$name", options)
      name -> spark.read.format(format).options(options)
        .load(s"$outPath/$name").count()
    }.toMap
    val manifest = counts.toSeq.sortBy(_._1)
      .map { case (n, c) => s""""$n":$c""" }.mkString("{", ",", "}")
    Files.write(Paths.get(s"$outPath/manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    counts
  }
}
