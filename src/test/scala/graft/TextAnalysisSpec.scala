package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.Sf

  test("docRepetition: planted looping text scores high, varied text scores 0") {
    val docs = Seq(
      1L -> "spam spam spam spam spam",          // 4 bigrams, 1 distinct → 0.75
      2L -> "one two three four five",           // 4 bigrams, all distinct → 0.0
      3L -> "ab cd ab cd ab cd",                 // 5 bigrams, 2 distinct → 0.6
      4L -> "solo",                              // no bigram → 0 with zero guard
      5L -> "")
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.docRepetition(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 4L, 1L, 0.75), (2L, 4L, 4L, 0.0), (3L, 5L, 2L, 0.6),
      (4L, 0L, 0L, 0.0), (5L, 0L, 0L, 0.0)))
  }

  test("split assignment is an INDEX-class cache: registered, memoized") {
    val key = org.apache.spark.sql.GraftBridge.sessionKey(spark) + "#" + sf
    TextAnalysis.hashSplit(spark, sf).count()
    assert(TextAnalysis.splitCache.contains(key))
    // INDEX class (r21): survives the per-pass result-memo eviction (a
    // per-doc hash assignment is precomputable per-item structure, the
    // fingerprint class) and is seen by the warmup-completeness
    // instrument, so the warmup waves must fill it
    Caches.clearResultMemos(spark)
    assert(TextAnalysis.splitCache.contains(key))
    assert(Caches.indexKeys(spark, sf).contains(key))
  }

  test("splitContamination finds a planted cross-split near-dup, deterministically") {
    // find shingle-sharing texts whose md5 CONTENT buckets provably land
    // on opposite sides of the split boundary — no corpus-statistics luck:
    // bucket = first byte of md5(text), exactly splitRaw's two-nibble rule
    def bucketOf(t: String): Int = java.security.MessageDigest
      .getInstance("MD5").digest(t.getBytes("UTF-8"))(0) & 0xFF
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november"
    def variant(i: Int) = s"$base oscar$i"
    val trainText = (0 until 500).map(variant).find(bucketOf(_) < 204).get
    val evalText = (0 until 500).map(variant).find(bucketOf(_) >= 230).get
    val dir = java.nio.file.Files.createTempDirectory("graft_contam").toString
    Seq(1L -> trainText, 2L -> evalText).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.splitContamination(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    // the variants share the base's internal 5-gram shingles → exactly one
    // contaminating train doc for the one eval doc
    assert(got === Seq((2L, "test", 1L)))
  }

  test("sourceOverlap: hand-computed Jaccard; token-free pairs omitted") {
    // kept vocab per source (after dictionary semi-join + stop-word anti-join):
    // srcA {table,value,key}, srcB {value,key,scan,row}, srcC {merge,sort}
    val docs = Seq(
      (1L, "table value key the", "srcA"),
      (2L, "value key scan row a", "srcB"),
      (3L, "merge sort", "srcC"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_overlap").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.sourceOverlap(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // only (srcA, srcB) share tokens: inter {value,key}=2, uni=5, j=0.4
    assert(got === Seq(("srcA", "srcB", 2L, 5L, 0.4)))
  }

  test("stratifiedSample: exact floor quota per stratum, content-keyed") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val xTexts = (0 until 6).map(i => s"x text number $i")
    val yTexts = (0 until 4).map(i => s"y text number $i")
    val docs = (xTexts.map((_, "srcX")) ++ yTexts.map((_, "srcY")))
      .zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
    val dir = java.nio.file.Files.createTempDirectory("graft_strat").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.stratifiedSample(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    // floor(6*0.2)=1 from srcX, floor(4*0.2)=0 from srcY
    assert(got.map(_._2) === Seq("srcX"))
    // the sampled doc is the md5-minimal srcX text — content decides, not id
    val expectText = xTexts.minBy(t => md5hex(s"sample|$t"))
    val expectId = docs.find(_._2 == expectText).get._1
    assert(got === Seq((expectId, "srcX", 1L)))
  }

  test("vocabGrowth: hand-computed novelty curve at batchSize=2") {
    val docs = Seq(
      0L -> "c1 c2 c3 c4 c5 c6",
      1L -> "c1 c2 c3 c4 c5 c6",      // verbatim: nothing new
      2L -> "c1 c2 c3 c4 c5 c7",      // one old shingle, one new
      3L -> "x1 x2 x3 x4 x5")         // entirely new
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.vocabGrowth(spark, dir, batchSize = 2)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 2L, 2L, 2L, 1.0),          // batch 0: both shingles new
      (1L, 3L, 2L, 4L, 0.666667)))    // batch 1: 3 seen, 2 new
  }

  test("vocabGrowth: final vocab_size equals the corpus distinct-shingle count") {
    val got = TextAnalysis.vocabGrowth(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val distinctShingles = graft.operators.Dedup.shingles(spark, sf)
      .select("shingle").distinct().count()
    assert(got.last._4 === distinctShingles, "running sum closes on the true vocab")
    assert(got.map(_._4) === got.map(_._4).sorted, "vocab_size is monotone")
    assert(got.map(_._3).sum === distinctShingles, "every shingle is new exactly once")
  }

  test("valueMedian matches a driver-side exact median on the corpus") {
    val got = graft.operators.Events.valueMedian(spark, sf)
      .as[(String, Long, Double)].collect()
      .map { case (t, n, m) => t -> (n, m) }.toMap
    val raw = graft.Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, vs) =>
        val s = vs.map(_._2).sorted
        val n = s.length
        val m: Double = if (n % 2 == 1) s(n / 2)
          else (BigDecimal.valueOf(s(n / 2 - 1)) / 2 +
                BigDecimal.valueOf(s(n / 2)) / 2).toDouble
        t -> (n.toLong, m)
      }
    assert(got === raw)
  }

  test("collocations: hand-computed PMI on a tiny corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pmi").toString
    Seq(1L -> "x y x y x y").toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.collocations(spark, dir, minCount = 1)
      .as[(String, String, Long, Double)].collect().toSeq
    // n(x y)=3, n(y x)=2, unigrams x=3 y=3, N=6:
    // pmi(x,y)=ln(3*6/9)=ln 2, pmi(y,x)=ln(2*6/9)=ln(4/3)
    assert(got === Seq(
      ("x", "y", 3L, 0.693147), ("y", "x", 2L, 0.287682)))
  }

  test("splitContamination: covers every eval doc; df cap only shrinks counts") {
    val full = TextAnalysis.splitContamination(spark, sf)
      .as[(Long, String, Long)].collect()
    val evalDocs = TextAnalysis.hashSplit(spark, sf)
      .filter($"split" =!= "train").count()
    assert(full.length.toLong === evalDocs, "one row per val/test doc, zeros included")
    assert(full.forall(r => r._2 == "val" || r._2 == "test"))
    assert(full.forall(_._3 >= 0))
    // dropping high-df shingles can only remove candidate pairs, never add
    val cappedDf = TextAnalysis.splitContamination(spark, sf, Some(50L))
    val capped = cappedDf
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    // the capped relation feeds BOTH join sides; it must come from the
    // persisted cache (one df hash-agg ever), not two plan instances —
    // self-join re-aliasing defeats exchange reuse, so the cache is the
    // mechanism (inspect AFTER collect: AQE finalizes the plan lazily)
    val plan = cappedDf.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"capped shingles should be read from the persisted cache:\n$plan")
    full.foreach { case (doc, _, n) =>
      assert(capped(doc) <= n, s"cap increased overlap for doc $doc")
    }
  }

  test("stratifiedSample: exact floor quota and pct-nesting at every rate") {
    val srcCounts = graft.Tables.documents(spark, sf)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    var prev = Map.empty[String, Set[Long]]
    // ascending rates: each stratum hits floor(n*pct/100) exactly, and the
    // rank ordering is pct-independent, so samples NEST as pct grows —
    // a pipeline can raise its sampling rate without churning picked docs
    for (pct <- Seq(1, 7, 20, 33, 50, 99, 100)) {
      val got = TextAnalysis.stratifiedSample(spark, sf, pct)
        .as[(Long, String, Long)].collect()
      val bySrc = got.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._1).toSet }
      srcCounts.foreach { case (src, n) =>
        assert(bySrc.getOrElse(src, Set.empty).size.toLong === n * pct / 100,
          s"quota off for $src at pct=$pct")
      }
      prev.foreach { case (src, picked) =>
        assert(picked.subsetOf(bySrc.getOrElse(src, Set.empty)),
          s"sample at lower pct not nested for $src at pct=$pct")
      }
      prev = bySrc
    }
    assert(prev.values.map(_.size).sum.toLong === srcCounts.values.sum,
      "pct=100 keeps every document")
  }

  test("packShards: hand-computed concat-and-chunk shard assignment") {
    // srcA token counts in doc order: 3, 4, 2, 5 — budget 6:
    //   first-token offsets 0, 3, 7, 9 → shards 0, 0, 1, 1
    // srcB: 2, 1 → offsets 0, 2 → both shard 0 (packs independently of A)
    val docs = Seq(
      (1L, "a b c", "srcA"), (2L, "d e f g", "srcA"),
      (3L, "h i", "srcA"), (4L, "j k l m n", "srcA"),
      (5L, "x y", "srcB"), (6L, "z", "srcB"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_pack").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.packShards(spark, dir, budget = 6)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("srcA", 0L, 2L, 7L, 1L, 2L),
      ("srcA", 1L, 2L, 7L, 3L, 4L),
      ("srcB", 0L, 2L, 3L, 5L, 6L)))
    // every document lands in exactly one shard; token payload is conserved
    assert(got.map(_._4).sum === 17L)
  }

  test("epochMix: small sources repeat toward parity, capped; largest stays 1") {
    // srcBig 8 docs, srcMid 3 docs (8 div 3 = 2 epochs), srcTiny 1 doc
    // (8 div 1 = 8 → capped at 4)
    val docs = ((1L to 8L).map(i => (i, s"t$i", "srcBig")) ++
      (9L to 11L).map(i => (i, s"t$i", "srcMid")) ++
      Seq((12L, "t12", "srcTiny")))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_mix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.epochMix(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    val epochsBySrc = got.groupBy(_._2).map { case (s, rs) =>
      s -> rs.groupBy(_._1).values.map(_.map(_._3).sorted).toSet }
    assert(epochsBySrc("srcBig") === Set(Seq(1L)))
    assert(epochsBySrc("srcMid") === Set(Seq(1L, 2L)))
    assert(epochsBySrc("srcTiny") === Set(Seq(1L, 2L, 3L, 4L)))
    // mixture sizes: 8·1 + 3·2 + 1·4
    assert(got.size === 18)
    // raising the cap lifts only the capped source
    val uncapped = TextAnalysis.epochMix(spark, dir, maxRepeat = 16)
    assert(uncapped.count() === 8L + 6L + 8L)
  }

  test("mergeAdjacentPair: rewrites every occurrence, drops successors, keeps non-matches") {
    import org.apache.spark.sql.functions.col
    val toks = Seq(
      (1L, 0, "x"), (1L, 1, "a"), (1L, 2, "b"), (1L, 3, "a"), (1L, 4, "b"), (1L, 5, "c"),
      (2L, 0, "a"), (2L, 1, "b"),
      (3L, 0, "b"), (3L, 1, "a")) // reversed pair: untouched
      .toDF("doc_id", "idx", "tok")
    val got = TextAnalysis.mergeAdjacentPair(toks, "a", "b")
      .orderBy("doc_id", "idx")
      .select("doc_id", "tok").as[(Long, String)].collect().toSeq
    assert(got === Seq(
      1L -> "x", 1L -> "a_b", 1L -> "a_b", 1L -> "c",
      2L -> "a_b",
      3L -> "b", 3L -> "a"))
  }

  test("gopherRules: each rule flags exactly its planted violation") {
    val docs = Seq(
      // 25 varied tokens, stop words present, mean length ≥ 3: all pass
      1L -> ("the quick brown fox jumps over the lazy sleeping dog while " +
        "the bright golden sun shines over the quiet green valley and " +
        "the birds sing"),
      2L -> "only ten little words sit in this short test line", // wc < 20
      3L -> Seq.fill(30)("spam").mkString(" "),      // repetition (and stop)
      4L -> (1 to 25).map(_.toString).mkString(" "), // digits: alpha + stop fail
      5L -> Seq.fill(22)("extraordinarily").mkString(" ")) // mean len > 10
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_gopher").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.gopherRules(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // independent plain-Scala rederivation of every flag
    val stop = graft.operators.TokenPipeline.StopWords.toSet
    val exp = docs.as[(Long, String)].collect().toSeq.sortBy(_._1).map {
      case (id, text) =>
        val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", "")
          .split(" ").filter(_.nonEmpty).toSeq
        val n = toks.size
        val bg = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        def f(b: Boolean) = if (b) 1L else 0L
        val flags = Seq(
          f(n >= 20 && n <= 100000),
          f(3 * n <= toks.map(_.length).sum && toks.map(_.length).sum <= 10 * n),
          f(toks.count(stop) >= 2),
          f(5 * toks.count(_.exists(_.isLetter)) >= 4 * n),
          f(10 * (bg.size - bg.distinct.size) <= bg.size))
        (id, n.toLong, flags(0), flags(1), flags(2), flags(3), flags(4),
          flags.product)
    }
    assert(got === exp)
    // and the planted violations landed where intended
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._8 === 1L, "doc 1 keeps")
    assert(byId(2L)._3 === 0L, "doc 2 fails wc")
    assert(byId(3L)._7 === 0L, "doc 3 fails repetition")
    assert(byId(4L)._6 === 0L, "doc 4 fails alpha")
    assert(byId(5L)._4 === 0L, "doc 5 fails mean word length")
  }

  test("gopherRules: corpus keep is the product of its flags and wc discriminates") {
    val got = TextAnalysis.gopherRules(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r._8 === r._3 * r._4 * r._5 * r._6 * r._7, s"doc ${r._1} keep")
    }
    // sf0.001 has docs on both sides of the 20-token floor
    assert(got.exists(_._3 === 0L) && got.exists(_._3 === 1L))
  }

  test("dupSpanCoverage: shared 5-gram is counted on both docs, unique doc scores 0") {
    val docs = Seq(
      1L -> "a b c d e f",       // shingles: "a b c d e", "b c d e f"
      2L -> "a b c d e x",       // shares "a b c d e" with doc 1
      3L -> "p q r s t u v")     // 3 shingles, all unique
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_spans").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.dupSpanCoverage(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 3L, 0L, 0.0)))
  }

  test("bpeCompression: tokens removed equals the sum of merge counts") {
    val merges = TextAnalysis.bpeMerges(spark, sf)
      .as[(Long, String, String, Long, String)].collect().toSeq
    val comp = TextAnalysis.bpeCompression(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // every merge occurrence deletes exactly one token from the stream
    assert(comp.map(_._2).sum - comp.map(_._3).sum === merges.map(_._4).sum)
    comp.foreach { case (id, before, after, ratio) =>
      assert(after >= 1L && after <= before, s"doc $id counts")
      assert(ratio > 0.0 && ratio <= 1.0, s"doc $id ratio")
    }
  }

  test("headCoverage: hand-counted Zipf curve on a planted corpus") {
    val docs = Seq(1L -> "a a a b b c").toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_head").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.headCoverage(spark, dir)
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, "a", 3L, 3L, 0.5),
      (2L, "b", 2L, 5L, 0.833333),
      (3L, "c", 1L, 6L, 1.0)))
  }

  test("bpeMerges: merged pair vanishes and round 2 re-derives from the rewritten stream") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val m = TextAnalysis.bpeMerges(spark, sf, rounds = 2)
      .as[(Long, String, String, Long, String)].collect().toSeq
    assert(m.map(_._1) === Seq(1L, 2L))
    val Seq((_, a1, b1, n1, mg1), (_, a2, b2, n2, _)) = m
    assert(mg1 === s"${a1}_$b1")
    // rebuild the round-1 rewrite independently and re-count pairs
    val toks0 = Tables.documents(spark, sf).select(col("doc_id"),
      posexplode(graft.functions.TextFns.tokenize(col("text"))).as(Seq("idx", "tok")))
    val after1 = TextAnalysis.mergeAdjacentPair(toks0, a1, b1)
    val byDoc = Window.partitionBy("doc_id").orderBy("idx")
    val pairs1 = after1.withColumn("nxt", lead("tok", 1).over(byDoc))
      .filter(col("nxt").isNotNull && col("tok") =!= col("nxt"))
      .groupBy("tok", "nxt").agg(count(lit(1)).as("n"))
    // the merged pair is gone from the rewritten stream...
    assert(pairs1.filter(col("tok") === a1 && col("nxt") === b1).count() === 0)
    // ...each merge removed exactly one token per occurrence...
    assert(after1.count() === toks0.count() - n1)
    // ...and round 2's winner is exactly the rewritten stream's top pair
    val top2 = pairs1.orderBy(col("n").desc, col("tok"), col("nxt")).limit(1)
      .as[(String, String, Long)].collect().head
    assert(top2 === ((a2, b2, n2)))
  }

  test("docNovelty: first doc owns everything, verbatim copy owns nothing") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c d"),            // 3 bigrams, all first-seen here → 1.0
      (2L, "a b c d"),            // verbatim copy → 0.0
      (3L, "c d e f"))            // bigrams: c d (seen), d e, e f → 2/3
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_novel").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.docNovelty(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 3L, 1.0), (2L, 3L, 0L, 0.0), (3L, 3L, 2L, 0.666667)))
  }

  test("tokenEntropy: uniform doc scores ln(n), constant doc scores 0") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c d"),            // uniform over 4 → ln(4)
      (2L, "x x x x"))            // single token → 0
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ent").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.tokenEntropy(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 4L, math.rint(math.log(4.0) * 1e6) / 1e6), (2L, 4L, 0.0)))
  }

  test("crossEntropy: planted two-doc corpus matches hand-computed CE and KL") {
    val docs = Seq(
      (1L, "a a a b"),            // n_a=3 n_b=1 N=4
      (2L, "a b"))                // n_a=1 n_b=1 N=2
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ce").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // corpus: c_a=4 c_b=2 T=6
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val ln = (x: Double) => math.log(x)
    val ce1 = ln(6) - (3 * ln(4) + 1 * ln(2)) / 4
    val h1 = ln(4) - (3 * ln(3)) / 4
    val ce2 = ln(6) - (1 * ln(4) + 1 * ln(2)) / 2
    val h2 = ln(2)
    val got = TextAnalysis.crossEntropy(spark, dir)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 4L, r6(ce1), r6(ce1 - h1)),
      (2L, 2L, r6(ce2), r6(ce2 - h2))))
    assert(got.forall(_._4 >= 0.0)) // KL(doc ‖ corpus) is non-negative
  }

  test("lengthQuantiles: picks the exact indexed doc on a planted source") {
    import org.apache.spark.sql.functions.col
    // 5 docs with token counts 1,2,3,4,5 → n=5; idx(p) = (4p)//100 + 1
    // p10 → rank 1 → 1; p50 → rank 3 → 3; p90 → rank 4 → 4
    val docs = (1L to 5L).map(i =>
      (i, (1L to i).map(j => s"w$j").mkString(" "), "s1")).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_quant").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.lengthQuantiles(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("s1", 5L, 1L, 3L, 4L)))
  }

  test("corpusReport: per-source counts sum to the per-doc verdict totals") {
    import org.apache.spark.sql.functions._
    val rep = TextAnalysis.corpusReport(spark, sf).persist()
    val tc = TextAnalysis.trainCorpus(spark, sf).persist()
    assert(rep.agg(sum("n_docs")).head().getLong(0) === tc.count())
    assert(rep.agg(sum("n_train_ok")).head().getLong(0) ===
      tc.filter(col("train_ok") === 1L).count())
    assert(rep.agg(sum("n_dedup_kept")).head().getLong(0) ===
      tc.filter(col("dedup_kept")).count())
    rep.unpersist(); tc.unpersist()
    ()
  }

  test("boilerplatePrefixes: planted template prefix dominates its source") {
    import org.apache.spark.sql.functions.col
    // src_a: 3 of 4 docs open with the same 5-token template; src_b varied
    val docs = Seq(
      (1L, "terms of service apply here foo", "src_a"),
      (2L, "terms of service apply here bar baz", "src_a"),
      (3L, "terms of service apply here qux", "src_a"),
      (4L, "something else entirely happens now", "src_a"),
      (5L, "one two three four five six", "src_b"),
      (6L, "alpha beta", "src_b"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.boilerplatePrefixes(spark, dir)
      .as[(String, Long, String, Long, Double)].collect().toSeq
    val aTop = got.filter(r => r._1 == "src_a" && r._2 == 1L).head
    assert(aTop._3 === "terms of service apply here")
    assert(aTop._4 === 3L)
    assert(aTop._5 === 0.75)
    // src_b: short doc contributes its full 2-token opening
    assert(got.exists(r => r._1 == "src_b" && r._3 == "alpha beta"))
  }

  test("tokenPagerank: hand-computed two-token graph, integer-exact") {
    import org.apache.spark.sql.functions.col
    // corpus "a b b": edges a→b (1), b→b (1); out(a)=out(b)=1; N=2
    // base = 1e9 div 2 = 5e8
    // round 1: inflow(b) = 5e8 + 5e8 = 1e9 → pr(b) = 15*5e8/100 + 85*1e9/100
    //          = 75_000_000 + 850_000_000 = 925_000_000; pr(a) = 75_000_000
    // round 2: inflow(b) = 75e6 + 925e6 = 1e9 → same values again
    val dir = java.nio.file.Files.createTempDirectory("graft_pr").toString
    Seq((1L, "a b b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.tokenPagerank(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 75000000L, 75000000L),
      ("b", 925000000L, 925000000L)))
  }

  test("dsirWeights: english docs outscore others on average, zero-bigram docs score 0") {
    import org.apache.spark.sql.functions._
    val w = TextAnalysis.dsirWeights(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "lang"), Seq("doc_id"))
      .persist()
    // every document appears exactly once
    assert(w.count() === Tables.documents(spark, sf).count())
    // the importance ratio is trained toward lang='en': the mean score of
    // english docs must exceed the mean score of the rest (the defining
    // property of an importance weight, not a statistical accident)
    val Seq(enAvg, restAvg) = w
      .withColumn("is_en", col("lang") === "en")
      .groupBy("is_en").agg(avg("score").as("s"))
      .orderBy(col("is_en").desc)
      .collect().toSeq.map(_.getDouble(1))
    assert(enAvg > restAvg)
    // docs with no bigram have nothing to score
    assert(w.filter(col("n_bigrams") === 0L && col("score") =!= 0.0).count() === 0)
    w.unpersist()
    ()
  }

  test("trainCorpus: verdict is consistent with its four component queries") {
    import org.apache.spark.sql.functions.col
    val tc = TextAnalysis.trainCorpus(spark, sf).persist()
    // one row per document, and the verdict is exactly the conjunction
    assert(tc.count() === Tables.documents(spark, sf).count())
    assert(tc.filter(col("train_ok") === 1L &&
      !(col("split") === "train" && col("dedup_kept") &&
        col("quality_ok") === 1L && col("contaminated") === 0L)).count() === 0)
    assert(tc.filter(col("train_ok") === 0L &&
      col("split") === "train" && col("dedup_kept") &&
      col("quality_ok") === 1L && col("contaminated") === 0L).count() === 0)
    // eval docs are never marked contaminated (the flag is train-side only)
    assert(tc.filter(col("split") =!= "train" && col("contaminated") =!= 0L)
      .count() === 0)
    // flags agree row-for-row with the standalone queries they compose
    val surv = graft.operators.Dedup.dedupSurvivors(spark, sf)
      .select(col("doc_id"), col("kept"))
    assert(tc.join(surv, Seq("doc_id"))
      .filter(col("dedup_kept") =!= col("kept")).count() === 0)
    val gq = TextAnalysis.gopherRules(spark, sf).select(col("doc_id"), col("keep"))
    assert(tc.join(gq, Seq("doc_id"))
      .filter(col("quality_ok") =!= col("keep")).count() === 0)
    val sp = TextAnalysis.hashSplit(spark, sf)
      .select(col("doc_id"), col("split").as("split2"))
    assert(tc.join(sp, Seq("doc_id"))
      .filter(col("split") =!= col("split2")).count() === 0)
    tc.unpersist()
    ()
  }

  test("dsirSelect equals the brute-force Gumbel-top-k over all scored docs") {
    // recompute every doc's key independently (JVM md5 + the same
    // u/g/rounding arithmetic) and take the top 200 by (gkey desc,
    // doc_id): the operator's distributed TakeOrdered must return
    // exactly that set in exactly that order
    val scores = TextAnalysis.dsirWeights(spark, sf)
      .select("doc_id", "score").as[(Long, Double)].collect()
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = scores.map { case (id, sc) =>
      val v = java.lang.Long.parseLong(md5hex(s"dsir|$id").take(13), 16)
      val u = (v.toDouble + 0.5) / 4503599627370496.0
      val gkey = BigDecimal(sc - math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, sc, gkey)
    }.sortBy { case (id, _, gkey) => (-gkey, id) }.take(200).toSeq
    val got = TextAnalysis.dsirSelect(spark, sf)
      .select("doc_id", "score", "gkey")
      .as[(Long, Double, Double)].collect().toSeq
    assert(got === expected)
  }

  test("docChunks: window geometry at every boundary case (W=64, O=16, S=48)") {
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      1L -> words(70),  // starts 0,48 → 64 + 22 tokens
      2L -> words(64),  // exactly one window (bound 47 < stride)
      3L -> words(65),  // second window carries exactly 1 non-overlap token
      4L -> words(16),  // shorter than overlap → still one chunk
      5L -> "",         // empty → no chunks
      6L -> words(1))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_chunks").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.docChunks(spark, dir)
      .select("doc_id", "chunk_id", "start_pos", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 64L), (1L, 1L, 48L, 22L),
      (2L, 0L, 0L, 64L),
      (3L, 0L, 0L, 64L), (3L, 1L, 48L, 17L),
      (4L, 0L, 0L, 16L),
      (6L, 0L, 0L, 1L)))
  }

  test("docChunks: chunks cover every token and agree with a direct slice") {
    import org.apache.spark.sql.functions._
    // reconstruction property on the real sf0.001 corpus: chunk 0 plus the
    // non-overlap tail of every later chunk re-concatenates to the doc's
    // token stream — no token lost to a cut, none double-counted
    val stride = TextAnalysis.ChunkWidth - TextAnalysis.ChunkOverlap
    val chunks = TextAnalysis.docChunks(spark, sf)
    val rebuilt = chunks.groupBy("doc_id").agg(
      sum(when(col("chunk_id") === 0, col("n_tokens"))
        .otherwise(col("n_tokens") - lit(TextAnalysis.ChunkOverlap)))
        .as("n_rebuilt"),
      count(lit(1)).as("n_chunks"),
      max(col("start_pos")).as("last_start"))
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokenize(col("text"))).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    val joined = rebuilt.join(toks, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("n_rebuilt") =!= col("n_toks")).count() === 0)
    // start positions advance by exactly stride: last_start = (k−1)·stride
    assert(joined
      .filter(col("last_start") =!= (col("n_chunks") - 1) * stride)
      .count() === 0)
  }

  test("chunkDuplicates: verbatim doc copies share every chunk; keeper is the minimum") {
    def words(a: Int, b: Int): String = (a to b).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      10L -> words(1, 70),   // two chunks
      11L -> words(1, 70),   // verbatim copy → both chunks duplicated
      12L -> words(500, 590) // unrelated → no duplicate groups
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_chunkdup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.chunkDuplicates(spark, dir)
      .select("n_occurrences", "n_docs", "keeper_doc_id", "keeper_chunk_id")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === Seq((2L, 2L, 10L, 0L), (2L, 2L, 10L, 1L)))
  }

  private def md5Hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  test("piiRedaction: hand-computed counts and redacted hash per residue path") {
    val docs = Seq(
      (0L, "hello world", "srcX"), // all five injections fire → 2,2,1
      (7L, "plain body", "srcY"),  // email only → 1,0,0
      (2L, "other text", "srcZ"))  // ip only (%3=2 kills email, %2=0) → 0,1,0
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.piiRedaction(spark, dir)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    val red0 = "hello world contact <EMAIL> cc <EMAIL>" +
      " from <IP> and <IP> call <PHONE>"
    val red7 = "plain body contact <EMAIL>"
    val red2 = "other text from <IP>"
    assert(got === Seq(
      (0L, 2L, 2L, 1L, red0.length.toLong, md5Hex(red0)),
      (2L, 0L, 1L, 0L, red2.length.toLong, md5Hex(red2)),
      (7L, 1L, 0L, 0L, red7.length.toLong, md5Hex(red7))))
  }

  test("piiRedaction: scrub is complete — no pattern survives on the corpus") {
    import org.apache.spark.sql.functions._
    // rebuild the redacted TEXT (not just the hash) via the shared
    // projection pieces and re-run all three detectors over it: zero hits
    val ptxt = TextAnalysis.piiInjected(col("doc_id"), col("text"), col("source"))
    val red = regexp_replace(regexp_replace(regexp_replace(ptxt,
      TextAnalysis.EmailRe, "<EMAIL>"),
      TextAnalysis.Ipv4Re, "<IP>"),
      TextAnalysis.PhoneRe, "<PHONE>")
    val residue = Tables.documents(spark, sf)
      .select((size(regexp_extract_all(red, lit(TextAnalysis.EmailRe), lit(0)))
        + size(regexp_extract_all(red, lit(TextAnalysis.Ipv4Re), lit(0)))
        + size(regexp_extract_all(red, lit(TextAnalysis.PhoneRe), lit(0))))
        .as("hits"))
    assert(residue.agg(sum(col("hits"))).as[Long].head() === 0L)
    // and the counts the query reports are non-trivial on the corpus
    val q = TextAnalysis.piiRedaction(spark, sf)
    assert(q.agg(sum(col("n_emails")) + sum(col("n_ips"))
      + sum(col("n_phones"))).as[Long].head() > 0L)
  }

  test("chunkPurge: verbatim copy loses every window; keeper doc keeps all") {
    def words(a: Int, b: Int): String = (a to b).map(i => s"p$i").mkString(" ")
    val full = words(1, 130) // 3 windows: 64 + 64 + 2
    val docs = Seq(
      20L -> full,
      21L -> full,            // verbatim copy → all 3 windows dropped
      22L -> words(500, 560), // unique → untouched
      23L -> "")              // empty → zero windows, md5("") retained
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_purge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.chunkPurge(spark, dir)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (20L, 3L, 3L, 0L, 130L, md5Hex(full)),
      (21L, 3L, 0L, 3L, 0L, md5Hex("")),
      (22L, 1L, 1L, 0L, 61L, md5Hex(words(500, 560))),
      (23L, 0L, 0L, 0L, 0L, md5Hex(""))))
  }

  test("crossCorpusChunkPurge: corpus hits drop everywhere, dump dups keep first") {
    def words(a: Int, b: Int): String = (a to b).map(i => s"x$i").mkString(" ")
    val shared = words(1, 130)   // 3 windows, known to the corpus side
    val dumpDup = words(300, 430) // 3 windows, duplicated WITHIN the dump
    val uniq = words(600, 660)    // 1 window, new
    val docs = Seq(
      1L -> shared,  // incoming; every window already in corpus (doc 2)
      2L -> shared,  // corpus
      3L -> dumpDup, // incoming; keeper of the within-dump pair
      5L -> dumpDup, // incoming; loses all 3 to doc 3
      7L -> uniq,    // incoming; untouched
      9L -> "")      // incoming; no windows
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_xpurge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.crossCorpusChunkPurge(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 0L, 3L, 0L, 0L, md5Hex("")),
      (3L, 3L, 3L, 0L, 0L, 131L, md5Hex(dumpDup)),
      (5L, 3L, 0L, 0L, 3L, 0L, md5Hex("")),
      (7L, 1L, 1L, 0L, 0L, 61L, md5Hex(uniq)),
      (9L, 0L, 0L, 0L, 0L, 0L, md5Hex(""))))
  }

  test("chunkPurge: corpus invariants — keeper accounting and lossless untouched docs") {
    import org.apache.spark.sql.functions._
    val purge = TextAnalysis.chunkPurge(spark, sf)
    // every distinct window keeps exactly one occurrence corpus-wide
    val distinctChunks = TextAnalysis.chunksOf(
      TextAnalysis.rawTokens(spark, sf), TextAnalysis.ChunkWidth, 0)
      .select("chunk_hash").distinct().count()
    assert(purge.agg(sum("n_kept")).as[Long].head() === distinctChunks)
    // kept + dropped = total, everywhere
    assert(purge.filter(col("n_kept") + col("n_dropped") =!= col("n_chunks"))
      .count() === 0)
    // something was actually dropped on the corpus (verbatim dups exist)
    assert(purge.agg(sum("n_dropped")).as[Long].head() > 0L)
    // untouched docs reconstruct losslessly: retained md5 = md5 of the
    // full space-joined token stream
    val fullHash = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(concat_ws(" ",
        graft.functions.TextFns.tokenize(col("text")))).as("full_hash"))
    val mismatches = purge.filter(col("n_dropped") === 0)
      .join(fullHash, "doc_id")
      .filter(col("retained_hash") =!= col("full_hash"))
    assert(mismatches.count() === 0)
  }
}
