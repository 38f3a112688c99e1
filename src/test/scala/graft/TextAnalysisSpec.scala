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
}
