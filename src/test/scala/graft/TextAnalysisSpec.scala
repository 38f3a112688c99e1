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

  test("splitContamination: covers every eval doc; df cap only shrinks counts") {
    val full = TextAnalysis.splitContamination(spark, sf)
      .as[(Long, String, Long)].collect()
    val evalDocs = TextAnalysis.hashSplit(spark, sf)
      .filter($"split" =!= "train").count()
    assert(full.length.toLong === evalDocs, "one row per val/test doc, zeros included")
    assert(full.forall(r => r._2 == "val" || r._2 == "test"))
    assert(full.forall(_._3 >= 0))
    // the corpus plants near-dups, and the hash split scatters them: some
    // contamination must be visible or the operator is vacuous here
    assert(full.exists(_._3 > 0), "expected planted cross-split overlap at this SF")
    // dropping high-df shingles can only remove candidate pairs, never add
    val capped = TextAnalysis.splitContamination(spark, sf, Some(50L))
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    full.foreach { case (doc, _, n) =>
      assert(capped(doc) <= n, s"cap increased overlap for doc $doc")
    }
  }
}
