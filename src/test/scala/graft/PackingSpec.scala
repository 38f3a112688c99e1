package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** The distributed prefix sum must equal the one-partition window it
  * replaces, and the packing geometry must be internally consistent —
  * the per-value guarantees the DuckDB oracle (q120) then pins per-row.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.Sf

  test("withExclusivePrefixSum equals the sequential scan across partitions") {
    // many partitions + skewed values so per-partition offsets matter;
    // keys deliberately NOT in partition order before the sort
    val vals = (0 until 997).map(i => ((i * 31) % 997).toLong -> (i % 13).toLong)
    val df = spark.createDataFrame(vals).toDF("k", "v").repartition(17)
    val got = Packing.withExclusivePrefixSum(df, "v", "run", col("k"))
      .select("k", "v", "run").as[(Long, Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    vals.sortBy(_._1).zip(got).foreach { case ((k, v), (gk, gv, grun)) =>
      assert(gk === k && gv === v)
      assert(grun === acc, s"k=$k")
      acc += v
    }
  }

  test("prefix sum rejects non-long value columns") {
    val df = Seq((1, 2)).toDF("k", "v") // ints
    intercept[IllegalArgumentException] {
      Packing.withExclusivePrefixSum(df, "v", "run", col("k"))
    }
  }

  test("packing geometry: docs abut exactly and window spans are minimal") {
    val cap = Packing.ContextTokens
    val rows = Packing.contextPacking(spark, sf)
      .select("doc_id", "n_toks", "start_tok", "first_win", "last_win",
        "n_windows")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // doc_id-ordered, exclusive: each doc starts where the previous ended
    var expectStart = 0L
    rows.foreach { case (id, n, start, fw, lw, nw) =>
      assert(start === expectStart, s"doc $id")
      expectStart += n
      assert(fw === start / cap)
      if (n > 0) {
        assert(lw === (start + n - 1) / cap)
        // spans = ceil((start%cap + n) / cap)
        assert(nw === (start % cap + n + cap - 1) / cap)
        assert(nw === lw - fw + 1)
      } else {
        assert(lw === fw && nw === 0L)
      }
    }
    // the packed stream is dense: total windows touched = ceil(total/cap)
    val total = rows.map(_._2).sum
    assert(rows.filter(_._2 > 0).map(_._5).max === (total - 1) / cap)
  }

  test("window segments reconstruct every doc and tile every window exactly") {
    val cap = Packing.ContextTokens
    val segs = Packing.windowSegments(spark, sf)
      .select("win", "doc_id", "doc_off", "win_off", "seg_len", "is_head",
        "is_tail")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(segs.nonEmpty)
    val place = Packing.contextPacking(spark, sf)
      .select("doc_id", "n_toks")
      .as[(Long, Long)].collect().toMap
    // per-doc: segments cover [0, n_toks) contiguously, one head, one tail
    segs.groupBy(_._2).foreach { case (doc, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"doc $doc")
      assert(sorted.map(_._5).sum === place(doc), s"doc $doc")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._5, s"doc $doc")
        case _ =>
      }
      assert(ss.map(_._6).sum === 1L && ss.map(_._7).sum === 1L, s"doc $doc")
    }
    // empty docs contribute nothing
    assert(segs.map(_._2).toSet === place.filter(_._2 > 0).keySet)
    // per-window: segments abut from offset 0 and fill the capacity
    // (except the final, possibly partial, window)
    val lastWin = segs.map(_._1).max
    segs.groupBy(_._1).foreach { case (win, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 === 0L, s"win $win")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 === a._4 + a._5, s"win $win")
        case _ =>
      }
      if (win != lastWin)
        assert(sorted.map(_._5).sum === cap, s"win $win")
    }
  }

  // ---- incremental packing index (round 17) ----

  private def tmpIndex(): String =
    java.nio.file.Files.createTempDirectory("graft-packidx")
      .resolve("idx").toString

  test("bootstrap + appends land bit-identical placement to the one-shot packing") {
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    // three monotone batches by doc_id range (the q121 cut)
    val mx = counts.agg(max("doc_id")).head().getLong(0)
    val (t1, t2) = (mx / 3, 2 * mx / 3)
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") <= t1), path)
    Packing.updatePackingIndex(spark,
      counts.filter(col("doc_id") > t1 && col("doc_id") <= t2), path)
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") > t2), path)
    val stored = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok", "first_win", "last_win",
        "n_windows")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val oneShot = Packing.contextPacking(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stored.length === oneShot.length && stored.nonEmpty)
    assert(stored.toSeq === oneShot.toSeq)
  }

  test("append rejects non-monotone doc_ids instead of corrupting placement") {
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    Packing.updatePackingIndex(spark, counts, path)
    val e = intercept[IllegalArgumentException] {
      Packing.updatePackingIndex(spark, counts.limit(1), path)
    }
    assert(e.getMessage.contains("monotone"))
  }

  test("empty batch is a no-op; appended totals chain exactly") {
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    // empty bootstrap: nothing committed, index reads empty
    val r0 = Packing.updatePackingIndex(spark, counts.limit(0), path)
    assert(r0("docs_added") === 0L)
    assert(Packing.readPackingIndex(spark, path).count() === 0L)
    val boot = Packing.updatePackingIndex(spark, counts, path)
    val day = counts.withColumn("doc_id", col("doc_id") + lit(1000000L))
    val a1 = Packing.updatePackingIndex(spark, day, path)
    assert(a1("batch") === 1L)
    assert(a1("total_tokens_after") ===
      boot("total_tokens_after") + a1("tokens_added"))
    assert(Packing.readPackingIndex(spark, path).count() ===
      boot("docs_added") + a1("docs_added"))
    val mn = Packing.readPackingIndex(spark, path)
      .where(col("batch") === 1L).agg(min("start_tok")).head().getLong(0)
    assert(mn === boot("total_tokens_after"))
  }

  test("segments from the stored index equal the one-shot derivation") {
    val oneShot = Packing.windowSegments(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val stored = Packing.windowSegmentsFromIndex(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(stored.nonEmpty && stored === oneShot)
    // the per-batch form over the whole stored index (batch 0 holds the
    // bootstrap — everything) reproduces the same map
    val path = Packing.PackingIndexPath(spark, sf) + "-stored"
    val perBatch = Packing.windowSegmentsForBatch(spark, path, 0L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(perBatch === oneShot)
  }

  test("materialized packed windows re-concatenate to the corpus token stream") {
    val out = java.nio.file.Files.createTempDirectory("graft_packed")
      .resolve("shards").toString
    val counts = Pipeline.materializePacked(spark, sf, out)
    val win = spark.read.parquet(s"$out/windows")
    val cap = Packing.ContextTokens
    // every window except the last is exactly capacity-long (dense packing)
    val sizes = win.select(col("win"),
      size(col("tokens")).cast("long").as("n"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(sizes.nonEmpty)
    assert(sizes.map(_._1).toSeq === sizes.indices.map(_.toLong)) // dense win ids
    sizes.dropRight(1).foreach { case (w, n) => assert(n === cap, s"win $w") }
    assert(sizes.last._2 > 0 && sizes.last._2 <= cap)
    // reconstruction: window streams in win order == corpus tokens in
    // doc_id order (the per-doc analogue lives in the q122 tiling test)
    val got = win.select(col("win"), col("tokens"))
      .as[(Long, Seq[String])].collect().sortBy(_._1).flatMap(_._2).toSeq
    val want = operators.TextAnalysis.rawTokens(spark, sf)
      .select("doc_id", "toks").as[(Long, Seq[String])]
      .collect().sortBy(_._1).flatMap(_._2).toSeq
    assert(got === want)
    assert(counts("tokens_written") === want.size.toLong)
    // the embedded boundary metadata IS the q122 segment map
    val meta = win
      .select(col("win"), explode(col("segments")).as("g"))
      .select(col("win"), col("g.doc_id"), col("g.win_off"),
        col("g.seg_len"), col("g.is_head"), col("g.is_tail"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val segMap = Packing.windowSegments(spark, sf)
      .select("win", "doc_id", "win_off", "seg_len", "is_head", "is_tail")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(meta === segMap)
    // shard ids are the declared pure function of window ids
    val shards = win.select(col("win"), col("shard").cast("long"))
      .as[(Long, Long)].collect()
    shards.foreach { case (w, s) =>
      assert(s === w / Pipeline.PackedWindowsPerShard)
    }
  }

  test("incremental shard append equals the one-shot packed artifact") {
    val counts = Packing.tokenCounts(spark, sf)
    val mx = counts.agg(max("doc_id")).head().getLong(0)
    val cut = 2 * mx / 3
    // deployment sequence: bootstrap index on the prefix, materialize,
    // append the tail batch, extend ONLY the dirty shards
    val idxA = tmpIndex()
    val outA = java.nio.file.Files.createTempDirectory("graft_pka").toString
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") <= cut), idxA)
    Pipeline.materializePackedFrom(spark, sf, idxA, outA)
    val shardsBefore = spark.read.parquet(s"$outA/windows")
      .select("shard").distinct().count()
    val app = Packing.updatePackingIndex(spark,
      counts.filter(col("doc_id") > cut), idxA)
    val r = Pipeline.appendPackedShards(spark, sf, idxA, outA, app("batch"))
    // one-shot reference artifact over the full corpus
    val idxB = tmpIndex()
    val outB = java.nio.file.Files.createTempDirectory("graft_pkb").toString
    Packing.updatePackingIndex(spark, counts, idxB)
    Pipeline.materializePackedFrom(spark, sf, idxB, outB)
    def snap(p: String) = spark.read.parquet(s"$p/windows")
      .select(col("win"), col("shard").cast("long").as("shard"),
        col("n_segs"), col("tokens"),
        to_json(col("segments")).as("segjson"))
      .as[(Long, Long, Long, Seq[String], String)].collect().sortBy(_._1).toSeq
    assert(snap(outA) === snap(outB))
    // the append REWROTE only from the dirty shard on: untouched shards
    // stayed (count monotonicity) and the rewrite floor is shard-aligned
    assert(r("rebuild_from_win") % Pipeline.PackedWindowsPerShard === 0L)
    assert(r("shards_rewritten") >= 1L)
    assert(r("shards_rewritten") <= r("shards_written"))
    assert(shardsBefore <= r("shards_written"))
    // idempotent replay: extending the same batch again changes nothing
    val r2 = Pipeline.appendPackedShards(spark, sf, idxA, outA, app("batch"))
    assert(snap(outA) === snap(outB))
    assert(r2("rebuild_from_win") === r("rebuild_from_win"))
    // manifests agree with the artifact
    assert(r("windows_written") === snap(outB).length.toLong)
  }

  test("shrinking re-pack leaves no stale trailing shards in the artifact") {
    // the verdict-r18 seam: truncate + SMALLER re-append repairs the
    // INDEX, but the artifact's dynamic overwrite only replaces shard
    // dirs present in the delta — trailing dirs from the larger
    // pre-truncate corpus must be DELETED, or a range read past the new
    // end returns dead windows
    val counts = Packing.tokenCounts(spark, sf)
    val mx = counts.agg(max("doc_id")).head().getLong(0)
    val t1 = mx / 3
    val idx = tmpIndex()
    val out = java.nio.file.Files.createTempDirectory("graft_pks").toString
    // windowsPerShard=2: the sf0.001 corpus packs into ~2 default-size
    // shards, too coarse for a shrink to cross a shard boundary — finer
    // shards make the seam observable without changing its mechanics
    val wps = 2L
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") <= t1), idx)
    val full = Packing.updatePackingIndex(spark,
      counts.filter(col("doc_id") > t1), idx)
    Pipeline.materializePackedFrom(spark, sf, idx, out, windowsPerShard = wps)
    val shardsBefore = new java.io.File(s"$out/windows").listFiles()
      .count(_.getName.startsWith("shard="))
    // corrected ingest: the tail batch was wrong — truncate it and
    // re-append only its first half (strictly fewer tokens)
    Packing.truncatePackingIndex(spark, idx, full("batch"))
    val half = Packing.updatePackingIndex(spark,
      counts.filter(col("doc_id") > t1 && col("doc_id") <= 2 * mx / 3), idx)
    val r = Pipeline.appendPackedShards(spark, sf, idx, out, half("batch"),
      windowsPerShard = wps)
    // the artifact now equals a fresh materialization of the repaired
    // index — including on disk: no shard dir beyond the new last shard
    val outB = java.nio.file.Files.createTempDirectory("graft_pksb").toString
    Pipeline.materializePackedFrom(spark, sf, idx, outB, windowsPerShard = wps)
    def snap(p: String) = spark.read.parquet(s"$p/windows")
      .select(col("win"), col("shard").cast("long").as("shard"),
        col("n_segs"), col("tokens"),
        to_json(col("segments")).as("segjson"))
      .as[(Long, Long, Long, Seq[String], String)].collect().sortBy(_._1).toSeq
    assert(snap(out) === snap(outB))
    val shardsAfter = new java.io.File(s"$out/windows").listFiles()
      .filter(_.getName.startsWith("shard="))
      .map(_.getName.stripPrefix("shard=").toLong)
    assert(shardsAfter.length < shardsBefore, "the shrink must free shards")
    val lastWin = snap(outB).map(_._1).max
    assert(shardsAfter.max === lastWin / wps)
    // a range read past the new end returns nothing stale
    assert(Pipeline.readPackedWindows(spark, out, lastWin + 1,
      lastWin + 10 * wps, windowsPerShard = wps).count() === 0L)
    // and the manifest recount described the cleaned artifact
    assert(r("windows_written") === snap(outB).length.toLong)
    assert(r("shards_written") === shardsAfter.length.toLong)
  }

  test("pure truncation repairs the artifact through the no-op append arm") {
    // review r19: a truncate with NOTHING to re-append (the bad tail is
    // simply recalled) has no valid batch number to extend with — the
    // repair is appendPackedShards with the truncated batch number, and
    // it must rebuild the boundary shard (a window can straddle the
    // dropped batch, so its CONTENT is stale, not just trailing dirs)
    // and prune everything beyond the committed end
    val counts = Packing.tokenCounts(spark, sf)
    val mx = counts.agg(max("doc_id")).head().getLong(0)
    val t1 = mx / 3
    val idx = tmpIndex()
    val out = java.nio.file.Files.createTempDirectory("graft_pkt").toString
    val wps = 2L
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") <= t1), idx)
    val full = Packing.updatePackingIndex(spark,
      counts.filter(col("doc_id") > t1), idx)
    Pipeline.materializePackedFrom(spark, sf, idx, out, windowsPerShard = wps)
    // recall the tail batch entirely; repair via the no-op append
    Packing.truncatePackingIndex(spark, idx, full("batch"))
    val r = Pipeline.appendPackedShards(spark, sf, idx, out, full("batch"),
      windowsPerShard = wps)
    assert(r("shards_rewritten") >= 1L, "the boundary shard must rebuild")
    // the repaired artifact equals a fresh materialization of the
    // truncated index — boundary window content included
    val outB = java.nio.file.Files.createTempDirectory("graft_pktb").toString
    Pipeline.materializePackedFrom(spark, sf, idx, outB, windowsPerShard = wps)
    def snap(p: String) = spark.read.parquet(s"$p/windows")
      .select(col("win"), col("shard").cast("long").as("shard"),
        col("n_segs"), col("tokens"),
        to_json(col("segments")).as("segjson"))
      .as[(Long, Long, Long, Seq[String], String)].collect().sortBy(_._1).toSeq
    assert(snap(out) === snap(outB))
    val lastWin = snap(outB).map(_._1).max
    assert(Pipeline.readPackedWindows(spark, out, lastWin + 1,
      lastWin + 10 * wps, windowsPerShard = wps).count() === 0L)
    // replaying the same no-op repair changes nothing (idempotent)
    val r2 = Pipeline.appendPackedShards(spark, sf, idx, out, full("batch"),
      windowsPerShard = wps)
    assert(r2("windows_rewritten") === 0L && snap(out) === snap(outB))
  }

  test("summary batches are numbered densely when a doc_id third is empty") {
    // advice r17: every doc_id above 2/3 of the max — the first two thirds
    // of the q121 cut are EMPTY batches (no-ops that consume no batch
    // number), so the one populated third must read back as batch 0, not 2
    // (the oracle's dense_rank over populated thirds mirrors this)
    val docs = (800L to 809L).map(i => i -> s"alpha beta gamma doc $i")
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_sparse").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Packing.packingIndexSummary(spark, dir)
      .select("batch", "n_docs").as[(Long, Long)].collect().toSeq
    assert(got === Seq(0L -> 10L))
    // two populated thirds with the MIDDLE empty → batches 0, 1
    val docs2 = ((10L to 14L) ++ (800L to 804L))
      .map(i => i -> s"alpha beta gamma doc $i").toDF("doc_id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("graft_sparse2").toString
    docs2.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val got2 = Packing.packingIndexSummary(spark, dir2)
      .select("batch", "n_docs", "min_doc").as[(Long, Long, Long)].collect().toSeq
    assert(got2 === Seq((0L, 5L, 10L), (1L, 5L, 800L)))
  }

  test("replay arm rejects an impostor batch sharing only the doc_id endpoints") {
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    Packing.updatePackingIndex(spark, counts, path)
    val day = counts.withColumn("doc_id", col("doc_id") + lit(1000000L))
    Packing.updatePackingIndex(spark, day, path)
    // same min/max doc_id as the last committed batch, but interior rows
    // dropped (an upstream dedup/filter change between delivery attempts)
    val (mn, mx) = {
      val r = day.agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0), r.getLong(1))
    }
    val impostor = day.filter(
      col("doc_id") === mn || col("doc_id") === mx)
    val e = intercept[IllegalArgumentException] {
      Packing.updatePackingIndex(spark, impostor, path)
    }
    assert(e.getMessage.contains("replay rejected"))
    // the TRUE redelivery still replays idempotently after the rejection
    val again = Packing.updatePackingIndex(spark, day, path)
    assert(again("docs_added") === day.count())
  }

  test("readPackingIndex hides a batch dir committed past the sidecar") {
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    Packing.updatePackingIndex(spark, counts, path)
    val visible = Packing.readPackingIndex(spark, path).count()
    // crash model: the NEXT append's parquet committed but its sidecar
    // write was lost — the orphaned batch=1 dir must stay invisible
    Packing.contextPacking(spark, sf)
      .select("doc_id", "n_toks", "start_tok", "first_win", "last_win",
        "n_windows")
      .write.mode("overwrite").parquet(s"$path/batch=1")
    assert(Packing.readPackingIndex(spark, path).count() === visible)
    assert(Packing.readPackingIndex(spark, path)
      .agg(max("batch")).head().getLong(0) === 0L)
  }

  test("compaction folds batch dirs with placement unchanged; appends still chain") {
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    val mx = counts.agg(max("doc_id")).head().getLong(0)
    val (t1, t2) = (mx / 3, 2 * mx / 3)
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") <= t1), path)
    Packing.updatePackingIndex(spark,
      counts.filter(col("doc_id") > t1 && col("doc_id") <= t2), path)
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") > t2), path)
    val before = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok", "first_win", "last_win",
        "n_windows")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val r = Packing.compactPackingIndex(spark, path)
    assert(r("batches_folded") === 3L && r("recovered") === 0L)
    val after = Packing.readPackingIndex(spark, path)
    assert(after.agg(max("batch")).head().getLong(0) === 0L)
    assert(after.select("doc_id", "n_toks", "start_tok", "first_win",
      "last_win", "n_windows")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      === before)
    // one physical batch dir remains; the staging anchor is gone
    val dirs = new java.io.File(path).listFiles
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs === Set("batch=0"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path + ".compact-staging")))
    // a later append chains from the folded total exactly
    val day = counts.withColumn("doc_id", col("doc_id") + lit(1000000L))
    val a = Packing.updatePackingIndex(spark, day, path)
    assert(a("batch") === 1L)
    val mn = Packing.readPackingIndex(spark, path)
      .where(col("batch") === 1L).agg(min("start_tok")).head().getLong(0)
    assert(mn === before.map(_._2).sum)
    // compacting a single-batch index is a no-op
    Packing.compactPackingIndex(spark, path) // folds 2 → 1 again
    assert(Packing.compactPackingIndex(spark, path)("batches_folded") === 1L)
  }

  test("compaction rejects a STALE staging anchor instead of rolling back appends") {
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    val mx = counts.agg(max("doc_id")).head().getLong(0)
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") <= mx / 2), path)
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") > mx / 2), path)
    Packing.compactPackingIndex(spark, path)
    // crash model: the fold above died AFTER its sidecar commit but BEFORE
    // deleting its staging — plant that committed anchor back...
    Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok", "first_win", "last_win",
        "n_windows")
      .write.mode("overwrite").parquet(path + ".compact-staging")
    // ...then the single writer resumed daily appends
    val day = counts.withColumn("doc_id", col("doc_id") + lit(1000000L))
    Packing.updatePackingIndex(spark, day, path)
    val before = Packing.readPackingIndex(spark, path).count()
    // the next compaction must adjudicate the anchor STALE (its totals no
    // longer match the sidecar) and fold FRESH — losing nothing
    val r = Packing.compactPackingIndex(spark, path)
    assert(r("recovered") === 0L)
    assert(Packing.readPackingIndex(spark, path).count() === before)
    assert(Packing.readPackingIndex(spark, path)
      .agg(max("doc_id")).head().getLong(0) ===
      day.agg(max("doc_id")).head().getLong(0))
  }

  test("compaction rejects a staging anchor spoofed by a same-endpoint re-pack") {
    // advice r19: the r18 freshness check compared only (totalToks,
    // maxDoc) — a truncate + re-append that restores the same token
    // total and max doc_id with PERMUTED interior counts would wrongly
    // resume from the stale staged copy and roll the index back. The
    // epoch + content-fingerprint adjudication must fold FRESH instead.
    val path = tmpIndex()
    val a = Seq(100L -> 5L, 101L -> 7L).toDF("doc_id", "n_toks")
    val b = Seq(200L -> 3L, 201L -> 9L).toDF("doc_id", "n_toks")
    Packing.updatePackingIndex(spark, a, path)
    Packing.updatePackingIndex(spark, b, path)
    // crash model: a fold completed its sidecar commit (post-fold state,
    // nextBatch=1) but died before deleting its staging — run the fold,
    // then re-plant the anchor exactly as that crash would have left it
    // (staged rows = the pre-fold content, epoch = the pre-fold sidecar)
    val staging = path + ".compact-staging"
    val preFoldSidecar = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_graft_packing_state")),
      java.nio.charset.StandardCharsets.UTF_8).trim
    Packing.compactPackingIndex(spark, path) // the "completed fold"
    Packing.readPackingIndex(spark, path) // folded content ≡ pre-fold rows
      .select("doc_id", "n_toks", "start_tok", "first_win", "last_win",
        "n_windows")
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(staging, "_graft_staging_epoch"),
      preFoldSidecar.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the single writer then re-packs: truncate to zero, re-append the
    // SAME docs with permuted counts — every sidecar identity field
    // (count, endpoints, token total, seed) matches the staged copy
    Packing.truncatePackingIndex(spark, path, 0L)
    val permuted = Seq(100L -> 7L, 101L -> 5L, 200L -> 9L, 201L -> 3L)
      .toDF("doc_id", "n_toks")
    Packing.updatePackingIndex(spark, permuted, path)
    val want = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val r = Packing.compactPackingIndex(spark, path)
    assert(r("recovered") === 0L, "the stale anchor must not be adopted")
    val got = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want, "compaction must never change placement")
  }

  test("pre-fold anchor spoofed by an identical-sidecar re-pack folds fresh") {
    // advice r19 (the PRE-fold arm's twin of the spoof test above): a
    // truncate + re-append reproducing the exact 8-field sidecar line —
    // same per-batch counts, endpoints, token totals, permuted interior
    // rows — makes the staged epoch equal the CURRENT sidecar, so epoch
    // equality alone would resume from the stale staged copy and roll
    // the re-pack back. With the committed dirs fully readable, the
    // staged-vs-committed fingerprint must adjudicate the anchor stale.
    val path = tmpIndex()
    Packing.updatePackingIndex(spark,
      Seq(100L -> 5L, 101L -> 7L).toDF("doc_id", "n_toks"), path)
    Packing.updatePackingIndex(spark,
      Seq(200L -> 3L, 201L -> 9L).toDF("doc_id", "n_toks"), path)
    val staging = path + ".compact-staging"
    val sidecar = java.nio.file.Paths.get(path, "_graft_packing_state")
    val preLine = new String(java.nio.file.Files.readAllBytes(sidecar),
      java.nio.charset.StandardCharsets.UTF_8).trim
    // a genuine fold stages and dies pre-fold...
    Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok", "first_win", "last_win",
        "n_windows")
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(staging, "_graft_staging_epoch"),
      preLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // ...then the single writer re-packs to a BYTE-IDENTICAL sidecar:
    // per-batch token sums, counts and endpoints all preserved, interior
    // counts permuted
    Packing.truncatePackingIndex(spark, path, 0L)
    Packing.updatePackingIndex(spark,
      Seq(100L -> 7L, 101L -> 5L).toDF("doc_id", "n_toks"), path)
    Packing.updatePackingIndex(spark,
      Seq(200L -> 9L, 201L -> 3L).toDF("doc_id", "n_toks"), path)
    assert(new String(java.nio.file.Files.readAllBytes(sidecar),
      java.nio.charset.StandardCharsets.UTF_8).trim === preLine,
      "fixture must reproduce the sidecar line exactly")
    val want = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val r = Packing.compactPackingIndex(spark, path)
    assert(r("recovered") === 0L, "the spoofed pre-fold anchor must not resume")
    val got = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want, "compaction must never roll the re-pack back")
  }

  test("pre-fold anchor still resumes when committed dirs are partially destroyed") {
    // the arm the epoch exists for: a fold that staged, committed its
    // epoch, and died MID-DELETION of the batch dirs — the committed
    // read can no longer reproduce the sidecar's identity, so the
    // fingerprint adjudication must fall back to trusting the epoch and
    // resume from the staged copy (content identical to pre-fold)
    val path = tmpIndex()
    Packing.updatePackingIndex(spark,
      Seq(100L -> 5L, 101L -> 7L).toDF("doc_id", "n_toks"), path)
    Packing.updatePackingIndex(spark,
      Seq(200L -> 3L, 201L -> 9L).toDF("doc_id", "n_toks"), path)
    val want = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val staging = path + ".compact-staging"
    Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok", "first_win", "last_win",
        "n_windows")
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(staging, "_graft_staging_epoch"),
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path, "_graft_packing_state")))
    // the crash got through deleting batch=0 before dying
    val b0 = new org.apache.hadoop.fs.Path(s"$path/batch=0")
    b0.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(b0, true)
    val r = Packing.compactPackingIndex(spark, path)
    assert(r("recovered") === 1L, "a half-deleted fold must resume from staging")
    val got = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want)
  }

  test("compaction resumes from a fresh anchor left by a crashed fold") {
    // the epoch's positive arm: a fold that staged (epoch = pre-fold
    // sidecar) and died BEFORE its sidecar commit must be recognized as
    // fresh and resumed — content identical, recovered=1
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    val mx = counts.agg(max("doc_id")).head().getLong(0)
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") <= mx / 2), path)
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") > mx / 2), path)
    val want = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val staging = path + ".compact-staging"
    Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok", "first_win", "last_win",
        "n_windows")
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(staging, "_graft_staging_epoch"),
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path, "_graft_packing_state")))
    val r = Packing.compactPackingIndex(spark, path)
    assert(r("recovered") === 1L, "a genuine crashed fold's anchor resumes")
    assert(Packing.readPackingIndex(spark, path)
      .agg(max("batch")).head().getLong(0) === 0L)
    val got = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want)
  }

  test("capacity is recorded in the sidecar and mismatches are rejected") {
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    Packing.updatePackingIndex(spark, counts, path) // built at ContextTokens
    val day = counts.withColumn("doc_id", col("doc_id") + lit(1000000L))
    val e1 = intercept[IllegalArgumentException] {
      Packing.updatePackingIndex(spark, day, path, capacity = 1024L)
    }
    assert(e1.getMessage.contains("capacity"))
    val e2 = intercept[IllegalArgumentException] {
      Packing.windowSegmentsForBatch(spark, path, 0L, capacity = 1024L)
    }
    assert(e2.getMessage.contains("capacity"))
    // the matching capacity still flows
    assert(Packing.windowSegmentsForBatch(spark, path, 0L).count() > 0L)
  }

  test("clearDir drops the on-disk stored-placement bootstrap with the cache") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stale").toString
    (0L to 9L).map(i => i -> s"alpha beta doc $i").toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val first = Packing.windowSegmentsFromIndex(spark, dir).count()
    assert(first === 10L)
    // the dir is REWRITTEN in place (the documented clearDir scenario) —
    // without the disk drop the next call would adopt stale placement
    (0L to 24L).map(i => i -> s"gamma delta doc $i").toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Caches.clearDir(spark, dir)
    assert(Packing.windowSegmentsFromIndex(spark, dir).count() === 25L)
  }

  test("q123's plan is map-side off the stored artifact: no window, no hash exchange") {
    val qe = Packing.windowSegmentsFromIndex(spark, sf).queryExecution
    // logical: no window function and no re-derivation of placement (the
    // prefix sum would surface as extra aggregates/joins; the stored read
    // is a bare relation + explode + projections)
    val logical = qe.optimizedPlan.toString
    assert(!logical.contains("Window"), s"window in plan:\n$logical")
    // physical: the ONLY exchange is the edge sort's range partitioning —
    // a hashpartitioning anywhere would mean a shuffle the map-side
    // derivation claim forbids
    val phys = qe.executedPlan.toString
    assert(!phys.contains("hashpartitioning"),
      s"unexpected hash exchange:\n$phys")
    assert(phys.contains("rangepartitioning"), "edge sort missing")
  }

  test("readPackedWindows prunes shard dirs and returns exactly the window range") {
    val counts = Packing.tokenCounts(spark, sf)
    val idx = tmpIndex()
    val out = java.nio.file.Files.createTempDirectory("graft_pkread")
      .resolve("a").toString
    Packing.updatePackingIndex(spark, counts, idx)
    val m = Pipeline.materializePackedFrom(spark, sf, idx, out)
    assert(m("shards_written") >= 2L) // the pruning claim needs >1 shard
    val wps = Pipeline.PackedWindowsPerShard
    // one full shard's range, mid-artifact
    val (fromW, toW) = (wps, 2 * wps - 1)
    val rd = Pipeline.readPackedWindows(spark, out, fromW, toW)
    val wins = rd.select("win").as[Long].collect().sorted.toSeq
    assert(wins === (fromW to math.min(toW,
      m("windows_written") - 1)).toSeq)
    // the scan's partition filters prune to ONE shard dir
    val plan = rd.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("(shard"), s"no shard partition filter in:\n$plan")
    val scanned = rd.select("shard").distinct().as[Long].collect().toSeq
    assert(scanned === Seq(fromW / wps))
  }

  test("appendPackedShards reports manifest keys on the no-op arm too") {
    val counts = Packing.tokenCounts(spark, sf)
    val idx = tmpIndex()
    val out = java.nio.file.Files.createTempDirectory("graft_pknoop")
      .resolve("a").toString
    Packing.updatePackingIndex(spark, counts, idx)
    Pipeline.materializePackedFrom(spark, sf, idx, out)
    val r = Pipeline.appendPackedShards(spark, sf, idx, out, batch = 999L)
    assert(r("shards_rewritten") === 0L && r("windows_rewritten") === 0L)
    assert(r("rebuild_from_win") === -1L)
    assert(r("windows_written") > 0L && r("shards_written") > 0L)
    assert(r.contains("tokens_written") && r.contains("segments_written"))
  }

  test("appendPackedShards refuses a windowsPerShard mismatching the manifest") {
    val counts = Packing.tokenCounts(spark, sf)
    val idx = tmpIndex()
    val out = java.nio.file.Files.createTempDirectory("graft_pkwps")
      .resolve("a").toString
    Packing.updatePackingIndex(spark, counts, idx)
    val m = Pipeline.materializePackedFrom(spark, sf, idx, out)
    // the written geometry rides the manifest
    assert(m("windows_per_shard") === Pipeline.PackedWindowsPerShard)
    assert(Pipeline.manifestWindowsPerShard(out)
      === Some(Pipeline.PackedWindowsPerShard))
    // a mismatched maintenance call must refuse BEFORE touching shard dirs
    // (advice r19: the trailing-shard prune computes dir ids from the
    // caller's setting — a mismatch would delete valid data)
    def snap(p: String) = spark.read.parquet(s"$p/windows")
      .select(col("win"), col("shard").cast("long").as("shard"),
        col("n_segs"), col("tokens"))
      .as[(Long, Long, Long, Seq[String])].collect().sortBy(_._1).toSeq
    val before = snap(out)
    val e = intercept[IllegalArgumentException] {
      Pipeline.appendPackedShards(spark, sf, idx, out, batch = 0L,
        windowsPerShard = Pipeline.PackedWindowsPerShard * 2)
    }
    assert(e.getMessage.contains("windows_per_shard"))
    assert(snap(out) === before, "refusal must leave the artifact untouched")
    // the matching setting still appends fine
    val r = Pipeline.appendPackedShards(spark, sf, idx, out, batch = 999L)
    assert(r("windows_rewritten") === 0L)
  }

  test("non-monotone ingest recovers via truncate + re-append (the re-pack procedure)") {
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    val mx = counts.agg(max("doc_id")).head().getLong(0)
    val (t1, t2) = (mx / 3, 2 * mx / 3)
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") <= t1), path)
    Packing.updatePackingIndex(spark,
      counts.filter(col("doc_id") > t1 && col("doc_id") <= t2), path)
    Packing.updatePackingIndex(spark, counts.filter(col("doc_id") > t2), path)
    // a LATE batch arrives whose doc_ids fall inside batch 1's range —
    // the monotone contract rejects it rather than corrupt placement
    val late = counts.filter(col("doc_id") > t1 && col("doc_id") <= t2)
      .withColumn("doc_id", col("doc_id") + lit(1L))
      .withColumn("n_toks", lit(7L))
    intercept[IllegalArgumentException] {
      Packing.updatePackingIndex(spark, late, path)
    }
    // recovery, exactly as documented on truncatePackingIndex: K = first
    // batch containing any doc_id >= the late min; truncate to K; re-read
    // the truncated tail's counts FROM THE INDEX; union the late rows
    // (late wins on doc_id collision — the corrected ingest); re-append
    val lateMin = late.agg(min("doc_id")).head().getLong(0)
    val perBatch = Packing.readPackingIndex(spark, path)
      .groupBy("batch").agg(max("doc_id").as("mx")).orderBy("batch")
      .as[(Long, Long)].collect()
    val k = perBatch.collectFirst { case (b, m) if m >= lateMin => b }.get
    assert(k === 1L)
    // MATERIALIZE the tail before truncating (procedure step 2): the
    // truncation deletes the dirs a lazy plan over the tail would read
    val tail = Packing.readPackingIndex(spark, path)
      .filter(col("batch") >= k).select("doc_id", "n_toks")
      .localCheckpoint()
    val merged = tail.join(late.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(late.select("doc_id", "n_toks"))
    val mergedRows = merged.as[(Long, Long)].collect().sortBy(_._1)
    Packing.truncatePackingIndex(spark, path, k)
    Packing.updatePackingIndex(spark, merged, path)
    // the repaired index equals packing the corrected corpus one-shot
    val keptHead = counts.filter(col("doc_id") <= t1)
      .as[(Long, Long)].collect().sortBy(_._1)
    val corrected = (keptHead ++ mergedRows).toSeq
    val got = Packing.readPackingIndex(spark, path)
      .select("doc_id", "n_toks", "start_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    var acc = 0L
    corrected.zip(got).foreach { case ((id, n), (gid, gn, gstart)) =>
      assert(gid === id && gn === n && gstart === acc, s"doc $id")
      acc += n
    }
    assert(got.length === corrected.length)
    // truncate-to-zero resets to bootstrap state
    Packing.truncatePackingIndex(spark, path, 0L)
    assert(Packing.readPackingIndex(spark, path).count() === 0L)
    val boot = Packing.updatePackingIndex(spark, counts, path)
    assert(boot("batch") === 0L)
  }

  test("crashed-append replay is idempotent (sidecar rolled back, rerun)") {
    val path = tmpIndex()
    val counts = Packing.tokenCounts(spark, sf)
    val boot = Packing.updatePackingIndex(spark, counts, path)
    val state = java.nio.file.Paths.get(path, "_graft_packing_state")
    val preAppend = java.nio.file.Files.readAllBytes(state)
    val day = counts.withColumn("doc_id", col("doc_id") + lit(1000000L))
    val a1 = Packing.updatePackingIndex(spark, day, path)
    // crash model: batch=1 parquet committed but the sidecar write was
    // lost — roll the sidecar back and replay the SAME append (drop the
    // Hadoop LocalFileSystem CRC shadow too: the raw rewrite would
    // otherwise fail its checksum, which is a test artifact — production
    // writes go through fs.create and keep the CRC in step)
    java.nio.file.Files.write(state, preAppend)
    java.nio.file.Files.deleteIfExists(
      state.getParent.resolve("._graft_packing_state.crc"))
    val a2 = Packing.updatePackingIndex(spark, day, path)
    assert(a2 === a1) // same batch number, same totals
    assert(Packing.readPackingIndex(spark, path).count() ===
      boot("docs_added") + a1("docs_added")) // no duplicate rows
  }
}
