package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale smoke: replicate sf0.1 (documents / embeddings / events) with
  * id offsets into a local dir, then run the heaviest queries and print
  * per-query timings. Text is kept IDENTICAL across copies on purpose:
  * every near-dup cluster becomes 10× larger, so the dedup candidate
  * joins, Jaccard verification, and label propagation are stressed at
  * their skew point (big buckets), not just at 10× rows.
  *
  * Usage: runMain graft.ScaleSmoke [outDir] [copies]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sf1x")
    val copies = if (args.length > 1) args(1).toInt else 10
    // extra args (dev loop only) restrict the run to the named queries
    val only = args.drop(2).toSet
    val src = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.start(cpus)

    // completeness marker written LAST (and stamped with the copy count):
    // a crash mid-generation or a different `copies` must trigger a rebuild,
    // not a silent read of a half/stale dataset
    val marker = java.nio.file.Paths.get(s"$out/.graft_complete")
    val fresh = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readString(marker).trim == copies.toString
    if (!fresh) {
      val n = lit(1000000L)
      def rep(table: String)(f: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): Unit = {
        val base = Tables.load(spark, src, table)
        val all = (0 until copies).map(i => f(base, i)).reduce(_ unionAll _)
        all.write.mode(SaveMode.Overwrite).parquet(s"$out/$table.parquet")
      }
      rep("documents")((d, i) => d.withColumn("doc_id", col("doc_id") + n * i))
      rep("embeddings")((d, i) => d.withColumn("vec_id", col("vec_id") + n * i))
      // events keep the raw `ts` column exactly as stored (either
      // generation — nanos int64 or native µs; Tables.events normalizes on
      // read); users offset so sessionization scales in group count
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      rep("events")((d, i) => d
        .withColumn("event_id", col("event_id") + n * i)
        .withColumn("user_id", col("user_id") + n * i))
      java.nio.file.Files.writeString(marker, copies.toString)
      println(s"[scale] generated $copies x sf0.1 at $out")
    }

    // warm the shared persisted relations first (same reasoning as Bench):
    // whichever query runs first would otherwise absorb the corpus-wide
    // tokenize/shingle/signature materialization and distort its number
    val w0 = System.nanoTime()
    operators.TokenPipeline.docTokenCounts(spark, out).count()
    operators.Dedup.shingles(spark, out).count()
    operators.Dedup.minhashSignatures(spark, out).count()
    println(f"[scale] warmup (hub/shingles/sigs) ${(System.nanoTime() - w0) / 1e9}%8.2f s")

    val heavy = Seq("q52_dup_clusters", "q22_minhash_signatures",
      "q26_ngram_jaccard", "q25_simhash_groups", "q36_sessions",
      "q23_minhash_neardups", "q27_embedding_neardups", "q53_simhash_hamming",
      "q57_simhash64_hamming", "q54_dedup_survivors",
      "q58_doc_repetition", "q59_split_contamination",
      // round 5: cross-corpus near-dup (the 1e6 id offset preserves parity,
      // so each mixed-parity near-dup pair collides 10×10 ways across the
      // split; same-parity verbatim clusters stay on one side), centroid
      // outliers (~5k-value sorted folds per (label,pos)), vocab growth
      "q62_cross_corpus", "q64_label_outliers", "q66_vocab_growth",
      "q70_collocations",
      // round 8: shard packing (per-source prefix-sum windows over 10×
      // rows), epoch mix (explode over the 10× doc set), BPE merge loop
      // (3 full-corpus window passes), SemDeDup (components over 10×
      // embedding edges — verbatim copies make every cluster 10× wider)
      "q71_pack_shards", "q72_epoch_mix", "q73_bpe_merges",
      "q74_semdedup_survivors",
      // round 8b: duplicated-span coverage (per-shingle df over the 10×
      // inverted index — verbatim copies push every shingle's df to ≥10),
      // minhash calibration (band-collision candidates × signature join
      // at 10× bucket width), quantized ANN (8 queries × 10× corpus scan)
      "q76_dup_span_coverage", "q78_minhash_calibration",
      "q77_knn_quantized",
      // round 8c: the end-to-end corpus verdict (survivors + gopher +
      // train→eval contamination, all over the 10× duplication skew),
      // DSIR weights (bigram-bucket aggregates over the 10× stream),
      // one Lloyd step (10× assignment through the min_by partial agg),
      // token PageRank (two join+agg rounds over the 10× edge counts)
      "q81_train_corpus", "q82_dsir_weights", "q83_kmeans_step",
      "q84_token_pagerank",
      // round 8d: the per-source report (aggregate over the 10× verdict),
      // boilerplate prefixes (10× corpus pass + grouped window — verbatim
      // copies drive every prefix's count to ≥10), dim stats (64 sorted
      // folds over 10× vectors), length quantiles (per-source ranking
      // window over 10× docs)
      "q86_corpus_report", "q87_boilerplate_prefixes", "q88_dim_stats",
      "q89_length_quantiles",
      // round 8e: positional span runs over the 10× verified-pair set —
      // the worst-case quadratic the verbatim duplication can build
      "q90_shared_spans",
      // round 8f: first-seen attribution (vocab-sized min-aggregate under
      // 10× duplication), per-doc entropy folds, and the source matrix
      // over the 10× pair population
      "q91_doc_novelty", "q92_token_entropy", "q93_source_dup_matrix",
      // byte-grain explode over the 10× corpus — the widest row blow-up
      // in the suite (one row per payload byte)
      "q94_payload_energy",
      // triangle enumeration over the 10× pair population (the dense-clique
      // worst case verbatim replication builds), and per-user gap medians
      // over 10× users
      "q95_dup_graph_stats", "q96_interarrival_median",
      // round 8g: prototype selection (10× assignment through the bounded
      // min-k partial agg) and the kNN vote (8 queries × 10× corpus scan)
      "q97_cluster_sample", "q98_knn_classify",
      // corpus-LM cross-entropy: vocab join + two per-doc folds over 10×
      "q99_cross_entropy",
      // round 9: conversion-latency cohort medians — one user-keyed window
      // pass + a per-(day) percentile over 10× users
      "q100_time_to_convert",
      // round 12: sketch + PQ rungs. Bloom decontamination streams the
      // replicated train side against the eval bit-set broadcast (the
      // bit-set is replication-INVARIANT — verbatim copies add no new
      // shingles, so the broadcast side stays byte-identical while the
      // probed side grows); CMS cells absorb 10× df mass into the same
      // 4×8192 grid; HLL registers must come out BIT-IDENTICAL to 1×
      // (register = max over distinct hashes — replication adds none);
      // PQ encodes 10× vectors through the broadcast codebook join
      "q102_bloom_decontamination", "q103_cms_heavy_hitters",
      "q104_hll_registers", "q105_knn_pq",
      // round 12b: chunking rungs. q106 is pure map-side, so rows scale
      // exactly linearly (chunk count is a function of each doc's text);
      // q107 is the inverse stress — verbatim replication makes EVERY
      // distinct chunk a duplicate group, so the report saturates at the
      // base corpus's distinct-chunk-hash count and the aggregate eats
      // copies× occurrences into a fixed-size output
      "q106_doc_chunks", "q107_chunk_dedup",
      // round 12c: histogram quantiles (the ≤256-cell-per-source grid
      // absorbs copies× docs into the same fixed report) and the DSIR
      // Gumbel draw (TakeOrdered over copies× keyed docs, 200 rows out)
      "q108_histogram_quantiles", "q109_dsir_select",
      // round 12d (this session's operators). q110 is pure map-side regex —
      // linear by construction. q111 is the purge's worst case: verbatim
      // replication makes EVERY window of copies 2..N a duplicate of copy
      // 1's, so the drop lists cover almost the whole corpus (the
      // drop-nearly-everything regime) while n_kept saturates at the base
      // distinct-window count. q112 rides the same widened propagation as
      // q52, then argmaxes over clusters that are copies× wider — and
      // every former singleton becomes a cluster of its own copies
      "q110_pii_redaction", "q111_chunk_purge", "q112_cluster_keepers",
      // q113 under replication: the 1e6 id offset is even, so parity is
      // preserved — the dump side is 2,500 odd docs × copies, every copy
      // of an odd doc a within-dump dup family, every even-side window a
      // corpus kill; kept saturates at the base dump's corpus-new set
      "q113_cross_corpus_purge",
      // round 14: recall calibration re-runs all four kNN rungs over the
      // copies× vector base (the query set stays the 8 original vec_ids,
      // so the output grain — 3 methods × 8 queries + 3 means — is
      // replication-invariant while every rung's scan side grows)
      "q115_ann_recall",
      // round 15: the operating-point sweep scores all 15 (bits, radius)
      // configs over the copies× scored-pair relation — same fixed grid
      // grain at any replication; the auto-pick ranks that table per
      // recall target (4 fixed rows)
      "q117_ann_sweep", "q118_ann_autopick",
      // round 16: the FP audit replays q102's replicated train side plus
      // the exact-overlap broadcast semi-join; like q102 its eval-derived
      // broadcast sides are replication-invariant while the probed side
      // grows, and its row count tracks q102's exactly
      "q119_bloom_fp_audit",
      // round 16b: context packing's two-job prefix sum sorts copies×
      // count rows (16 bytes each); one placement row out per document
      "q120_context_packing",
      // round 17: the incremental packing index replays bootstrap + two
      // appends over the replicated corpus; output is the 3-row per-batch
      // summary at any replication (batch cut = thirds of the doc_id
      // range, and every rung populates all three ranges)
      "q121_packing_index",
      // round 17b: the window-segment map explodes copies× placement rows
      // into Σ n_windows segments; row count is NOT derivable from copies
      // alone (window alignment shifts per copy because total tokens mod
      // capacity ≠ 0), so this leg checks execution, not an expectRows pin
      "q122_window_segments",
      // round 18: the same map from the STORED placement artifact —
      // bootstraps the on-disk index once (session-cached), then the
      // derivation is a map-side explode of the committed 48-byte/doc rows
      "q123_window_segments_stored",
      // round 18b: the packed-shard materializer moves the copies× token
      // stream exactly once (slice map-side, one capacity-bounded
      // groupBy(win), partitioned write) then digests the written
      // artifact; the heaviest I/O leg in the suite by design — the
      // output IS the training artifact
      "q124_packed_shards",
      // round 18c: multi-benchmark bloom — the per-benchmark bit-sets are
      // replication-INVARIANT (verbatim copies add no eval shingles or
      // sources) while the flagged train side grows copies×; one row per
      // (train doc, benchmark)
      "q125_multibench_bloom",
      // round 18d: the per-benchmark FP audit replays q125's train side
      // plus the exact-overlap broadcast join; same grain as q125
      "q126_multibench_fp_audit",
      // round 18d: format sniffing is pure map-side — one row per doc
      // (the planted arm is doc_id mod |PlantTable|, so offset copies
      // shift arms — the output stays one row per doc regardless)
      "q127_format_sniff",
      // round 19: the bloom sizing report — benchmark-grain aggregates of
      // the memoized q125 flag relation; the benchmark universe and each
      // benchmark's ladder rung are replication-INVARIANT (verbatim
      // copies add no eval shingles), only the summed train counts grow
      "q128_bloom_sizing")
    val qs = SparkEntry.queries
    // Self-check where the row count is DERIVABLE from replication:
    // per-document / per-vector / per-user relations must have exactly
    // copies × the sf0.1 base cardinality (docs 5,000; vectors 2,000;
    // event users 15,000) — a wrong count here means the operator lost
    // or duplicated rows under replication, not that it got slow.
    val expectRows: Map[String, Long] = Map(
      "q22_minhash_signatures" -> 5000L, "q54_dedup_survivors" -> 5000L,
      "q52_dup_clusters" -> 5000L, "q58_doc_repetition" -> 5000L,
      "q72_epoch_mix" -> 5000L, "q74_semdedup_survivors" -> 2000L,
      "q76_dup_span_coverage" -> 5000L, "q81_train_corpus" -> 5000L,
      "q82_dsir_weights" -> 5000L, "q91_doc_novelty" -> 5000L,
      "q92_token_entropy" -> 5000L, "q94_payload_energy" -> 5000L,
      "q99_cross_entropy" -> 5000L,
      // bloom output = one row per TRAIN doc (content-hash split is
      // text-keyed, so every copy of a doc lands in the same split:
      // 3,973 train docs per sf0.1 copy)
      "q102_bloom_decontamination" -> 3973L,
      // same grain as q102: one row per train doc
      "q119_bloom_fp_audit" -> 3973L,
      // one row per (train doc, benchmark): 3,973 train docs × the 20
      // eval sources per sf0.1 copy (both factors replication-stable —
      // content-hash split and verbatim copies)
      "q125_multibench_bloom" -> (3973L * 20L),
      // q126 shares q125's exact grain
      "q126_multibench_fp_audit" -> (3973L * 20L),
      // one sniff row per document
      "q127_format_sniff" -> 5000L,
      // one chunk row per (doc, window): 6,923 per sf0.1 copy
      "q106_doc_chunks" -> 6923L,
      // one scrub / purge row per document
      "q110_pii_redaction" -> 5000L, "q111_chunk_purge" -> 5000L,
      // one placement row per document
      "q120_context_packing" -> 5000L,
      // one row per INCOMING (odd doc_id) document
      "q113_cross_corpus_purge" -> 2500L
    ).map { case (k, v) => k -> v * copies } ++
      // replication-INVARIANT outputs: fixed-size sketch reports must not
      // scale with copies at all (q103 top-50; q104 (sources+1)·64
      // register rows — identical registers, since verbatim copies add no
      // distinct shingles; q105 8 queries × top-5)
      Map("q103_cms_heavy_hitters" -> 50L,
        "q104_hll_registers" -> 1344L,
        "q105_knn_pq" -> 40L,
        // q115: 3 methods × 8 query points + 3 per-method mean rows —
        // the query set is the 8 original vec_ids at any replication
        "q115_ann_recall" -> 27L,
        // q117: one row per SweepConfigs entry, whatever the corpus size;
        // q118: one row per PickTargets entry (every target satisfiable —
        // the exhaustive config's recall is 1.0 by construction)
        "q117_ann_sweep" -> 15L, "q118_ann_autopick" -> 4L) ++
      // for copies ≥ 2 every one of the base corpus's 6,824 distinct
      // chunk hashes appears `copies` times, so the duplicate report is
      // exactly the distinct-chunk relation — saturated, not scaling
      (if (copies >= 2) Map("q107_chunk_dedup" -> 6824L) else Map.empty) ++
      // q112 at copies ≥ 2: verbatim copies weld each base component's
      // copies together and turn every former singleton into a cluster of
      // its own copies, so components = base components (233 at sf0.1)
      // + base unclustered docs (5,000 − 477) — invariant in `copies`
      (if (copies >= 2) Map("q112_cluster_keepers" -> 4756L) else Map.empty) ++
      // q108: one row per source (20 at sf0.1) whatever the corpus size;
      // q109: the draw is exactly k = 200 rows by construction
      Map("q108_histogram_quantiles" -> 20L, "q109_dsir_select" -> 200L,
        // q128: one sizing row per benchmark (the 20 eval sources),
        // whatever the replication — the filters are sized by DISTINCT
        // eval shingles, which verbatim copies never add to
        "q128_bloom_sizing" -> 20L,
        // q121: one summary row per batch — the three-way doc_id-range
        // cut holds at every replication (copies sit at 1e6 offsets, so
        // all three thirds of the range are populated)
        "q121_packing_index" -> 3L)
    var bad = 0
    heavy.filter(n => only.isEmpty || only(n)).foreach { name =>
      val t0 = System.nanoTime()
      val r = try {
        val c = qs(name)(spark, out).count()
        expectRows.get(name) match {
          case Some(e) if e != c => bad += 1; s"rows=$c MISMATCH expected=$e"
          case _ => s"rows=$c"
        }
      } catch { case e: Throwable => bad += 1; s"FAILED: ${e.getMessage.take(200)}" }
      println(f"[scale] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $r")
    }
    require(bad == 0, s"$bad scale-smoke failures/row mismatches (see above)")

    // q114 index-reuse rung (round 13): a deployment keeps
    // chunk_index.parquet and incrementally unions each day's dump instead
    // of recomputing the corpus side per run (the q113 shape). Timed at
    // this replication rung:
    //   bootstrap   — wipe, then build the index from the FULL replicated
    //                 corpus (the recompute-every-run cost);
    //   incremental — update the stored index with a one-copy dump (the
    //                 daily step: re-hash only the dump, anti-join the
    //                 stored 16-byte-hash artifact, rewrite).
    // Invariants: verbatim copies contribute ZERO new hashes (chunk hashes
    // are content-only, so the base corpus already holds every chunk), the
    // index stays flat at the base distinct-chunk count across rungs, and
    // incremental beats bootstrap — the reason the artifact exists.
    // one timing/file-listing convention for BOTH index rungs below — a
    // change to how rung legs are measured must land in one place
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def partFiles(path: String): Set[String] = {
      val d = new java.io.File(path)
      if (!d.exists) Set.empty
      else d.listFiles.map(_.getName).filter(_.startsWith("part-")).toSet
    }
    if (only.isEmpty || only("q114_chunk_index_buckets")) {
      val idx = Pipeline.ChunkIndexPath(spark, out)
      val toks = operators.TextAnalysis.rawTokens(spark, out)
      val (boot, ta) = timed {
        Pipeline.deleteChunkIndex(idx)
        Pipeline.updateChunkIndex(spark, toks, idx)
      }
      val (incr, tb) = timed {
        Pipeline.updateChunkIndex(spark, toks.where(col("doc_id") < 1000000L), idx)
      }
      println(f"[scale] q114 index bootstrap   $ta%8.2f s  ${boot.toSeq.sorted.mkString(", ")}")
      println(f"[scale] q114 index incremental $tb%8.2f s  ${incr.toSeq.sorted.mkString(", ")}")
      require(incr("hashes_added") == 0L,
        s"verbatim dump added ${incr("hashes_added")} hashes — chunk hashing is not content-only")
      require(boot("hashes_after") == incr("hashes_after"),
        "index size moved on a no-new-hashes update")
      // the wall-clock comparison is a HARD gate only where the intrinsic
      // margin dwarfs host noise (≥50×: bootstrap hashes ≥50 copies vs the
      // incremental's one — measured 10×/25×/75× gaps at 100×/200×); at
      // small rungs a single GC pause could flip an ~2× margin and abort a
      // whole smoke whose row invariants all passed (review r13)
      if (copies >= 50)
        require(tb < ta,
          f"incremental update ($tb%.2f s) did not beat bootstrap recompute ($ta%.2f s)")
      else if (tb >= ta)
        println(f"[scale] WARNING: incremental ($tb%.2f s) did not beat " +
          f"bootstrap ($ta%.2f s) at ${copies}x — margin is small at this " +
          "rung; re-run or check the 100x/200x anchors before reading it as a regression")
    }

    // q116 bucketed-index rung (round 14): the DEPLOYMENT layout —
    // a chunk_hash-bucketed catalog table whose daily update APPENDS
    // delta-sized bucket files instead of rewriting the index. Legs:
    //   bootstrap — wipe, build the table from the EVEN-doc_id half of
    //               the corpus (parity survives replication: the 1e6
    //               offset is even, so every copy of a doc keeps its
    //               parity and the even half holds the same content set
    //               at every rung);
    //   delta     — update with the FULL corpus: the odd docs' corpus-new
    //               hashes append; every bootstrap part file must still
    //               exist afterwards (append-shaped, never a rewrite);
    //   verbatim  — repeat the full-corpus update: zero added hashes,
    //               zero new files, index flat.
    if (only.isEmpty || only("q116_bucketed_index_summary")) {
      val (table, path) = Pipeline.BucketedChunkIndexLocation(spark, out)
      val toks = operators.TextAnalysis.rawTokens(spark, out)
      val (boot, ta) = timed {
        Pipeline.deleteBucketedChunkIndex(spark, table, path)
        Pipeline.updateChunkIndexBucketed(spark,
          toks.where(col("doc_id") % 2 === 0L), table, path)
      }
      val bootFiles = partFiles(path)
      val (delta, td) = timed {
        Pipeline.updateChunkIndexBucketed(spark, toks, table, path)
      }
      val deltaFiles = partFiles(path)
      val (verb, tv) = timed {
        Pipeline.updateChunkIndexBucketed(spark, toks, table, path)
      }
      val verbFiles = partFiles(path)
      println(f"[scale] q116 bucketed bootstrap $ta%8.2f s  ${boot.toSeq.sorted.mkString(", ")}  files=${bootFiles.size}")
      println(f"[scale] q116 bucketed delta     $td%8.2f s  ${delta.toSeq.sorted.mkString(", ")}  files=${deltaFiles.size}")
      println(f"[scale] q116 bucketed verbatim  $tv%8.2f s  ${verb.toSeq.sorted.mkString(", ")}  files=${verbFiles.size}")
      require(delta("hashes_added") > 0L,
        "odd-doc dump added no hashes — the parity delta device broke")
      require(bootFiles.subsetOf(deltaFiles),
        "delta update rewrote bootstrap bucket files — append shape broken")
      require(verb("hashes_added") == 0L,
        s"verbatim dump added ${verb("hashes_added")} hashes — chunk hashing is not content-only")
      require(verbFiles == deltaFiles,
        "no-new-hashes update touched the stored table's files")
      require(delta("hashes_after") == verb("hashes_after"),
        "index size moved on a no-new-hashes update")
    }

    // q121 packing-index rung (round 17): the placement map's delta
    // posture — VERDICT r16 item 4's "append-leg rung like the index's".
    //   bootstrap   — wipe, ONE batch = the full replicated corpus (the
    //                 recompute-every-run cost: sorts copies× count rows);
    //   incremental — append a one-copy "next ingest day" whose doc_ids
    //                 sit above the stored max (the monotone-id regime):
    //                 O(batch) sort + O(batch) write, flat across rungs.
    // Invariants: the appended batch's first start_tok equals the
    // bootstrap's committed token total (placement continues EXACTLY —
    // no re-sort, no gap, no overlap), its row count is one copy's docs,
    // and the stored relation grows by exactly that count.
    if (only.isEmpty || only("q121_packing_index")) {
      val path = operators.Packing.PackingIndexPath(spark, out)
      val counts = operators.Packing.tokenCounts(spark, out)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val baseDocs = counts.where(col("doc_id") < 1000000L).count()
      val (boot, ta) = timed {
        operators.Packing.deletePackingIndex(spark, path)
        operators.Packing.updatePackingIndex(spark, counts, path)
      }
      val day = counts.where(col("doc_id") < 1000000L)
        .withColumn("doc_id", col("doc_id") + lit(copies * 1000000L))
      val (incr, tb) = timed {
        operators.Packing.updatePackingIndex(spark, day, path)
      }
      counts.unpersist()
      // round 18 (VERDICT r17 item 1): extending the loader's composition
      // map after the append is O(batch) — the segment derivation reads
      // ONLY the appended batch=1 dir (partition-pruned) and explodes it
      // map-side; flat across replication rungs while bootstrap grows
      val (nSeg, tc) = timed {
        operators.Packing.windowSegmentsForBatch(spark, path, 1L).count()
      }
      println(f"[scale] q121 packing bootstrap   $ta%8.2f s  ${boot.toSeq.sorted.mkString(", ")}")
      println(f"[scale] q121 packing incremental $tb%8.2f s  ${incr.toSeq.sorted.mkString(", ")}")
      println(f"[scale] q121 segment extension   $tc%8.2f s  segments=$nSeg")
      require(nSeg >= baseDocs,
        s"appended batch's segment map holds $nSeg rows for $baseDocs docs" +
          " — every non-empty doc must contribute at least one segment")
      require(incr("docs_added") == baseDocs,
        s"append wrote ${incr("docs_added")} placement rows, expected $baseDocs")
      val app = operators.Packing.readPackingIndex(spark, path)
        .where(col("batch") === 1L)
        .agg(min("start_tok"), count(lit(1))).head()
      require(app.getLong(0) == boot("total_tokens_after"),
        s"appended batch starts at ${app.getLong(0)}, stored total was " +
          s"${boot("total_tokens_after")} — placement did not continue exactly")
      require(app.getLong(1) == baseDocs,
        s"stored appended batch holds ${app.getLong(1)} rows, expected $baseDocs")
      // same hard-gate posture as the q114 rung: wall-clock only where
      // the intrinsic margin (copies× vs 1×) dwarfs host noise
      if (copies >= 50)
        require(tb < ta,
          f"incremental append ($tb%.2f s) did not beat bootstrap ($ta%.2f s)")
      else if (tb >= ta)
        println(f"[scale] WARNING: incremental ($tb%.2f s) did not beat " +
          f"bootstrap ($ta%.2f s) at ${copies}x — margin is small at this " +
          "rung; check the 100x/200x anchors before reading it as a regression")

      // q124 artifact rung (round 18): the loader shard artifact's delta
      // posture as the REAL deployment sequence — bootstrap an index on
      // the corpus prefix (all but the last replica), materialize its
      // shard artifact (moves the prefix token stream once), then append
      // the LAST replica's counts to the index and EXTEND the artifact:
      // only the shards the appended day touches rewrite (dynamic
      // partition overwrite). The appended ids must be real corpus docs —
      // the q121 rung's synthetic +offset day has no text for the token
      // join, which is why this rung builds its own index on a prefix cut.
      val artIdx = s"$path-art"
      val art = s"$out-packed"
      val cAll = operators.Packing.tokenCounts(spark, out)
      val mxDoc = cAll.agg(max("doc_id")).head().getLong(0)
      val cut =
        if (copies >= 2) (copies.toLong - 1L) * 1000000L else mxDoc / 2 + 1
      // DEPLOYMENT shard sizing, not q124's oracle-granularity default:
      // windowsPerShard = 512 ≈ 1M tokens/shard, so the shard-dir count
      // stays bounded at every rung (the default 8 produced 3,305 dirs at
      // 200× and partition LISTING — not data — dominated the extension
      // leg at ~18 s; a real loader sizes shards to ~file-system block
      // budgets exactly to avoid that smallfile regime)
      val wps = 512L
      val (full, tf) = timed {
        operators.Packing.deletePackingIndex(spark, artIdx)
        operators.Packing.deletePackingIndex(spark, art) // recursive rm
        operators.Packing.updatePackingIndex(spark,
          cAll.where(col("doc_id") < cut), artIdx)
        Pipeline.materializePackedFrom(spark, out, artIdx, art,
          windowsPerShard = wps)
      }
      val (ext, ti) = timed {
        val app = operators.Packing.updatePackingIndex(spark,
          cAll.where(col("doc_id") >= cut), artIdx)
        Pipeline.appendPackedShards(spark, out, artIdx, art, app("batch"),
          windowsPerShard = wps)
      }
      println(f"[scale] q124 artifact prefix     $tf%8.2f s  windows=${full("windows_written")} shards=${full("shards_written")}")
      println(f"[scale] q124 artifact extend     $ti%8.2f s  rewrote ${ext("shards_rewritten")} of ${ext("shards_written")} shards (${ext("windows_rewritten")} windows)")
      // the extended artifact holds EXACTLY the full corpus token stream
      val totalToks = cAll.agg(coalesce(sum("n_toks"), lit(0L)))
        .head().getLong(0)
      require(ext("tokens_written") == totalToks,
        s"extended artifact holds ${ext("tokens_written")} tokens, corpus has $totalToks")
      require(ext("windows_written") ==
        (totalToks + operators.Packing.ContextTokens - 1) /
          operators.Packing.ContextTokens,
        "extended artifact's window count is not ceil(tokens/capacity)")
      require(ext("shards_rewritten") < ext("shards_written"),
        "the extension rewrote every shard — the delta posture broke")
      if (copies >= 50)
        require(ti < tf,
          f"shard extension ($ti%.2f s) did not beat the prefix " +
            f"materialization ($tf%.2f s)")
    }
    spark.stop()
  }
}
