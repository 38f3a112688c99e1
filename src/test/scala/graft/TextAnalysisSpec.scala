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
