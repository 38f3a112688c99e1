package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for headline queries → PLANS.md, the
  * checked-in evidence that pushdown/broadcast/custom operators land where
  * the scale-design notes claim (run after operator changes).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = Sessions.start("4", logLevel = "ERROR")

    val picks = Seq(
      "q06_filtered_scan" ->
        "predicate pushdown + column pruning: PushedFilters at the parquet scan, 5-column ReadSchema",
      "q02_revenue_by_nation" ->
        "star join: both dims broadcast (no shuffle for the joins), partial/final hash aggregate",
      "q23_minhash_neardups" ->
        "LSH banding: candidates from an equi-join on (band, bucket) — no all-pairs anywhere",
      "q29_knn_ivf" ->
        "IVF ANN: graft_dot (custom codegen expression) inside the project; bucket equi-join broadcasts the query set",
      "q50_asof_native" ->
        "native as-of operator: AsOfJoinExec fed by one Exchange + Sort per side",
      "q53_simhash_hamming" ->
        "SimHash hamming probing: candidates from a (band, key) equi-join over banded signature bits, exact popcount verify — never all-pairs",
      "q57_simhash64_hamming" ->
        "64-bit SimHash over two longs: (d+1)-band keys, same equi-join candidate posture at the full literature-standard width",
      "q43_top_terms" ->
        "bounded top-k via native collect_top_k instead of a ranking window: partial_collect_top_k in the map-side ObjectHashAggregate carries at most k rows per doc through partial/shuffle/final",
      "q54_dedup_survivors" ->
        "dedup survivors: one left join of documents against the (cached, checkpoint-truncated) rep-level component labels",
      "q59_split_contamination" ->
        "cross-split contamination: shingle posting join between split-filtered semi-joins of the cached shingle relation — candidates from the equi-join, zeros preserved via left join",
      "q62_cross_corpus" ->
        "cross-corpus near-dup: band equi-join BETWEEN the two parity sides of the cached shingle relation — never incoming×incoming, never all-pairs",
      "q64_label_outliers" ->
        "label outliers: two-level chunked centroid fold — (label,pos,chunk) then (label,pos) aggregates, every buffered array ≤ 4096 — → 10-row centroid relation broadcast back; distance via the codegen graft_dot, bounded window per label",
      "q66_vocab_growth" ->
        "vocab growth: two hash-aggregates over the cached shingle relation; the running-sum window orders BATCHES (corpus/batchSize rows), not documents",
      "q68_salted_revenue" ->
        "salted skew join: big side salted on a deterministic row hash, small side exploded across the salt range, equi-join on (key, salt) — the hot-key spread visible in the join keys",
      "q70_collocations" ->
        "PMI collocations: bigram + unigram hash-aggregates, vocabulary-sized unigram sides broadcast back twice, scalar corpus total as a broadcast cross join — one corpus pass per aggregate, no shuffle joins",
      "q61_funnel" ->
        "strict-order funnel in ONE event-grain exchange: three chained whole-partition window minima (t2 reads the t1 column — no join back), then a user-grain aggregate reusing the window's hashpartitioning(user_id) — no per-step joins",
      "q74_semdedup_survivors" ->
        "SemDeDup survivors: verbatim vectors collapse via an md5-keyed groupBy with map-side partial min (no full-embedding shuffle keys), the narrow (vec_id, rep) membership localCheckpoint-materialized, then one left join against the checkpoint-truncated component labels (edges from q27's bucketed sign-LSH equi-join)",
      "q76_dup_span_coverage" ->
        "duplicated-span coverage: the CACHED per-shingle df index artifact (round 12, shared with q103) joined back to the cached shingle relation, then a per-doc aggregate — the inverted index costed, never doc pairs",
      "q77_knn_quantized" ->
        "int8-quantized ANN: codegen transform to integer codes, 8-row quantized query set broadcast, integer-dot ranking — the 4×-narrower first-pass scan",
      "q78_minhash_calibration" ->
        "minhash calibration: distinct (band,bucket) equi-join candidates; both signature sides read the one cached q22 relation; exact-Jaccard verify joins the cached shingles",
      "q79_bpe_compression" ->
        "tokenizer application: k chained window rewrites sharing ONE hashpartitioning(doc_id) exchange — no per-round aggregates or checkpoints in the apply path",
      "q80_head_coverage" ->
        "Zipf head coverage: TakeOrderedAndProject for the top-k (per-partition heaps, no global sort), windows only over the k-row result, scalar total broadcast",
      "q81_train_corpus" ->
        "end-to-end corpus verdict: the four stage relations (split, survivors, gopher flags, contamination) assembled by doc_id-keyed joins; contamination candidates from the shingle equi-join between split-filtered semi-joins — no stage recomputed, no all-pairs",
      "q82_dsir_weights" ->
        "DSIR weights: the CACHED bucket-vector relation joined to the CACHED 256-row learned weight table (both index artifacts, round 12), per-doc score an order-independent scaled-integer SUM inside a codegen'd hash aggregate — no ObjectHashAggregate, no sorted fold",
      "q83_kmeans_step" ->
        "k-means step: broadcast seed centroids cross-joined map-side, partial min_by collapses k candidates to 1 BEFORE the exchange (n rows shuffle, not n·k; sort-based agg locally — struct ordering isn't hash-aggregable), then the two-level (cluster,pos,chunk)→(cluster,pos) fold with ≤4096-element buffers",
      "q84_token_pagerank" ->
        "token PageRank: per-iteration contribution join keyed on the token and a target-keyed aggregate — the same hashpartitioning both rounds, edges/out-degrees reused from the cached token stream",
      "q90_shared_spans" ->
        "shared spans: positional shingle joins gated by the verified near-dup pair set (the quadratic is bounded by the dedup ladder's output, not the corpus); islands window partitions by (pair, diagonal) — never wider than one document's shingles",
      "q91_doc_novelty" ->
        "doc novelty: first-seen min-aggregate over the bigram stream (vocabulary-sized result) joined back onto the same stream — two hash aggregates and one equi-join, no windows over documents",
      "q93_source_dup_matrix" ->
        "source dup matrix: two doc_id equi-joins attribute the verified pair set to source cells; the aggregate output is |sources|² regardless of corpus scale",
      "q97_cluster_sample" ->
        "cluster prototypes: bounded min-k via native collect_top_k (q43's device) carries at most m rows per cluster through partial/shuffle/final — no ranking window over the full assignment",
      "q98_knn_classify" ->
        "kNN classify: 8-row query set broadcast against the corpus scan, codegen graft_dot scoring, vote counts aggregated at (query,label) grain — k·|queries| rows through the shuffle, not the corpus",
      "q99_cross_entropy" ->
        "corpus cross-entropy: vocabulary-sized unigram LM aggregate broadcast back onto the token stream, both folds token-ordered inside one per-doc ObjectHashAggregate — two corpus passes, no joins wider than the vocab",
      "q100_time_to_convert" ->
        "time-to-convert: strict view→click→purchase resolved by three chained whole-partition window minima in ONE hashpartitioning(user_id) exchange (the q61 funnel device), then the constructed per-cohort median over day-grain groups",
      "q101_token_counts_filescale" ->
        "reference-scale membership: the 235,886-line dictionary file survives as a BroadcastExchange feeding the left-semi BroadcastHashJoin (and the 668-line stop list its left-anti twin) — a few MB of strings, never a shuffled join over the corpus",
      "q102_bloom_decontamination" ->
        "bloom decontamination (round 16 shape): the CACHED eval bit-set artifact (≤2^18 rows by construction) feeds k=4 BroadcastHashJoins over the train side's k position COLUMNS — one train scan, no explode, no shingle-grained Exchange; the only shuffles are the doc-grain partial/final aggregate and the edge join back to the train-doc universe",
      "q119_bloom_fp_audit" ->
        "bloom FP audit: q102's plan plus the exact overlap — the distinct eval shingle set survives as a BroadcastExchange feeding a left-semi BroadcastHashJoin over one more train-side scan; every eval-derived side is broadcast (benchmark-bounded), the train side is never shuffled against eval data",
      "q103_cms_heavy_hitters" ->
        "CMS heavy hitters: the report set comes from a distributed TakeOrdered over the CACHED df index artifact (50 rows), the 4×8192 cell grid from one partial-aggregated groupBy over the same relation, broadcast back for the 50-row estimate join — estimates are table probes, not a universe-wide aggregate",
      "q105_knn_pq" ->
        "PQ ANN: the 128-row codebook and the 8-row per-query ADC table set are BroadcastExchanges; encoding is one corpus pass through the broadcast codebook join + min_by partial agg; the scan is a broadcast join against the table set with bounded top-k via native collect_top_k — no ranking window over the corpus, no unbounded shuffle key",
      "q106_doc_chunks" ->
        "fixed-window chunking: one Generate (posexplode of the window-start sequence) + codegen'd slice/md5 projection over the cached ordered-token relation — no join, no aggregate; the only exchange is the report ORDER BY, so 100 TB chunks per-partition independently",
      "q107_chunk_dedup" ->
        "chunk-hash dedup: one partial/final hash aggregate keyed on the 32-char chunk hash over the q106 projection — the shuffle carries md5 strings + packed longs, never chunk text; the duplicate filter runs post-aggregate on group counts",
      "q108_histogram_quantiles" ->
        "histogram quantiles: map-side bin projection, partial/final hash aggregate to the ≤256-cell-per-source grid, windows ONLY over the grid rows — no per-source ranking window over documents (q89's exact form), the mergeable-sketch shape",
      "q109_dsir_select" ->
        "DSIR Gumbel draw: map-side key projection over the q82 score relation, then TakeOrderedAndProject (per-partition top-k heaps — k rows per partition travel, no global sort); the ranking window runs over the 200-row result only",
      "q110_pii_redaction" ->
        "PII scrub: ONE map-side Project carrying all six regex outputs over the parquet scan — no join, no aggregate, no exchange below the edge sort; 100 TB scrubs partition by partition",
      "q111_chunk_purge" ->
        "chunk purge: keeper adjudication on the NARROW (doc_id, chunk_id, hash) explode — two hash aggregates whose shuffles carry md5 strings + packed longs; the per-doc drop lists join back onto the token relation as the AQE-broadcast side, and the rebuild (slice/filter/flatten/md5) is a map-side array transform — the corpus text appears in no Exchange",
      "q112_cluster_keepers" ->
        "quality keepers: the cached component-label relation joined to the narrow (doc_id, n_chars) projection, then ONE partial/final hash aggregate computing the packed 64-bit MAX — length-argmax without max_by, windows, or a second pass",
      "q113_cross_corpus_purge" ->
        "cross-corpus purge: the corpus side collapses to a distinct-hash aggregate; both adjudication joins run on narrow (hash, packed-long) relations; the per-doc reason aggregate joins back onto the dump's token relation as the AQE-broadcast side — dump text in no Exchange",
      "q114_chunk_index_buckets" ->
        "stored-index summary: a plain parquet scan of the persisted 16-byte-hash artifact (built via bootstrap + incremental anti-join union, atomic dir swap) into one partial/final hash aggregate per leading-nibble bucket — constant aggregation state (count/min/max/sum), no window, no text",
      "q115_ann_recall" ->
        "ANN recall calibration: all four kNN rungs read the one cached vector index; the scoring joins (grid left-joins over returned/hit counts) run at (method x query) grain — K·|queries| rows through every exchange, diagnostic-priced at any corpus size",
      "q116_bucketed_index_summary" ->
        "bucketed stored-index summary: the chunk_hash-bucketed catalog table (bootstrap + two delta-shaped APPENDS) scanned into one partial/final hash aggregate per leading-nibble bucket — dual commutative digests, constant aggregation state; see the §chunk-index section below for the incremental anti-join's no-stored-side-Exchange evidence",
      "q117_ann_sweep" ->
        "ANN operating-point sweep: ONE scored-pair pass (corpus scan against the 8-row broadcast query set, codegen graft_dot) crossed with the BROADCAST 15-row config grid; candidate membership is a codegen'd masked-popcount filter, ranking windows partition by (bits, radius, query) over K·|queries|·configs rows — 15 probe joins collapsed into one diagnostic-priced pass",
      "q118_ann_autopick" ->
        "ANN auto-pick: one ROW_NUMBER window over the MEMOIZED 15-row sweep table crossed with the 4-row broadcast target list — the deployment decision costs nothing beyond the sweep it reads",
      "q120_context_packing" ->
        "context packing: the global exclusive prefix sum is TWO jobs over the 16-byte (doc_id, n_toks) relation — range-partitioned total sort, per-partition subtotals (#partitions values) to the driver, seeded per-partition scan — so the final plan below is Scan ExistingRDD + the window-geometry Project and the edge sort; NO window function, no single-partition funnel anywhere (the one-liner `sum over (order by)` alternative would execute as ONE partition)",
      "q121_packing_index" ->
        "incremental packing summary: the STORED placement relation (batch=N partition dirs + running-total sidecar) scanned with partition discovery into one partial/final hash aggregate at batch grain — constant aggregation state (count/min/max/sum); the appends that built it are O(batch) seeded prefix sums (q120's two-job idiom) that read ZERO stored rows — the sidecar seed replaces the corpus re-sort",
      "q123_window_segments_stored" ->
        "stored-derived segment map: the persisted placement artifact (an InMemoryTableScan over the committed index's doc-grain read — NO prefix sum, no corpus re-sort anywhere in the plan) into one Generate (explode of each doc's window span) + the integer segment-geometry Project; the only exchange is the edge sort — the loader's composition map is a map-side derivation of the committed 48-byte/doc rows",
      "q124_packed_shards" ->
        "packed-shard digest: a parquet scan of the WRITTEN window artifact (shard partition dirs) — per-window md5 content digest computed map-side in the Project, then ONE partial/final hash aggregate at shard grain with constant state (count/sum); the materializer that built it moved tokens exactly once (map-side slice, one capacity-bounded groupBy(win), partitioned write)",
      "q125_multibench_bloom" ->
        "multi-benchmark bloom: the k RAW 24-bit bloom positions projected ONCE per train shingle (one md5, CSE'd nibble extractions), every benchmark's all-k-hit flag a map-side graft_bitset_contains probe (custom codegen expression: unboxed word array shipped by task reference, one mask+index+shift per test — the mask folds the shared raw position to each benchmark's OWN power-of-two filter width (r19 per-benchmark sizing), constant-size rendering — the hex-substr first cut cost 24.7 s warm and an array LITERAL OOMed plan stringification; no join anywhere below the doc-grain aggregate, the filters ride the task binary); ONE partial/final groupBy(doc_id) carries a counter per benchmark, the per-benchmark columns stack map-side (Generate over a literal struct array), and the only other shuffle is the edge join to the train-doc × benchmark universe",
      "q128_bloom_sizing" ->
        "bloom sizing report: benchmark-grain aggregates of the q126 audit (partial/final hash agg over the memoized flag relation — the train side is NOT re-read; the alphabetically-earlier q125/q126 paid it), joined to two BOUNDED eval-side relations (distinct-shingle counts and the cached (benchmark, mbits) sizing) — every join side is benchmark-cardinality, nothing corpus-sized moves")

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence (generated by `runMain graft.Plans`)\n\n")
    sb.append(s"Input: `$sfDir`. Regenerate after operator changes.\n")
    def section(name: String, why: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect() // run THIS DataFrame's queryExecution so AQE finalizes
      val plan = df.queryExecution.executedPlan.toString
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      // 90 lines reaches the build-side branches of the deeper two-join
      // plans (q102's pos-keyed semi-join sits below its doc-grain joins)
      sb.append(plan.linesIterator.take(90).mkString("\n"))
      sb.append("\n```\n")
    }
    picks.foreach { case (name, why) =>
      section(name, why, SparkEntry.queries(name)(spark, sfDir))
    }
    // Iterative queries hide their per-round structure behind
    // localCheckpoints (each round is its own job), so their FINAL plans
    // carry no evidence — dump one round's relation against the real
    // inputs instead.
    locally {
      // q52: one min-label propagation round in its round-3+ jump form.
      // Evidence to check: ONE hashpartitioning(doc_id) exchange feeding
      // the grouped min, and the pointer-doubling self-join consuming the
      // aggregate's OUTPUT — at sf AQE broadcasts that tiny side
      // (BroadcastHashJoin on newc=jid in the dump); at scale both sides
      // share the aggregate's exchange (ReusedExchange). Either way the
      // jump adds no corpus-side shuffle. (Rounds 1–2 run the same plan
      // minus the jump join; Dedup.propagateMinLabels gates it.)
      val (verts, sym) = operators.Dedup.dupClusterGraph(spark, sfDir, collapse = true)
      val labels0 = verts.distinct()
        .withColumn("component_id", org.apache.spark.sql.functions.col("doc_id"))
        .localCheckpoint()
      section("q52_dup_clusters — one propagation round (jump form)",
        "min-label propagation round over the REP graph: labels join onto edge targets through ONE hashpartitioning(doc_id) exchange, grouped min, then the round-3+ pointer-doubling self-join over the aggregate's output — AQE broadcasts that tiny side at sf (the BroadcastHashJoin on newc=jid below); at scale both sides share the aggregate's exchange (ReusedExchange) — either way the jump adds no corpus-side shuffle",
        operators.Dedup.propagationRound(labels0, sym, jump = true))
      org.apache.spark.sql.GraftBridge.unpersistCheckpointRdds(labels0)
    }
    locally {
      // q73: one BPE learning round's pair scoring — the k-round loop's
      // whole per-round cost. Evidence to check: ONE hashpartitioning
      // (doc_id) exchange feeding the adjacency window, partial/final
      // hash aggregate on (tok, nxt), and TakeOrderedAndProject for the
      // top-1 (per-partition heaps, no global sort; the collected row is
      // the loop's only driver traffic).
      section("q73_bpe_merges — one learning round's pair scoring",
        "adjacent-pair counts over the positional token stream: window over one doc_id exchange, hash aggregate, TakeOrderedAndProject top-1 — the per-round corpus pass is linear and the driver receives ONE row per round",
        operators.TextAnalysis.bpeRoundTop(
          operators.TextAnalysis.bpeTokenStream(spark, sfDir)))
    }
    locally {
      // §chunk-index (VERDICT r13 #1): the bucketed store's INCREMENTAL
      // anti-join — the structural claim is that the stored side's
      // bucketed scan already satisfies the join's required
      // HashPartitioning(chunk_hash, buckets), so the ONLY Exchange in
      // the update plan is the delta-sized dump side. Pinned confs for
      // the evidence: broadcast off (at sf the tiny store would otherwise
      // broadcast — fine locally, but the deployment store is billions of
      // rows and must never be the build side) and shuffle partitions =
      // bucket count (the deployment sizing, so the dump's distinct lands
      // AT the join's partitioning). BucketedIndexSpec asserts the same
      // one-Exchange structure mechanically.
      val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val shuffleBefore = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.shuffle.partitions",
          Pipeline.ChunkIndexBuckets.toString)
        val (table, path) = Pipeline.BucketedChunkIndexLocation(spark, sfDir)
        val toks = operators.TextAnalysis.rawTokens(spark, sfDir)
        Pipeline.deleteBucketedChunkIndex(spark, table, path)
        Pipeline.updateChunkIndexBucketed(spark,
          toks.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
          table, path)
        val dump = operators.TextAnalysis
          .chunksOf(toks, operators.TextAnalysis.ChunkWidth, 0)
          .select("chunk_hash").distinct()
        section("chunk-index — incremental anti-join over the bucketed store",
          "the daily update step: today's dump hashes LEFT ANTI the stored index — the stored FileScan reads `Bucketed: true` with NO Exchange above it (its bucketing IS the join's required hashpartitioning); the single Exchange in the plan is the dump side's distinct, which at deployment is delta-sized; a nonzero result then APPENDS delta-sized bucket files (never a rewrite)",
          dump.join(spark.table(table), Seq("chunk_hash"), "left_anti"))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
        spark.conf.set("spark.sql.shuffle.partitions", shuffleBefore)
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
