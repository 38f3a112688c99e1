package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.Sf

  test("minhash candidates ⊇ verified high-jaccard pairs from exhaustive scan") {
    val lsh = Dedup.minhashNearDups(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exhaustive = Dedup.ngramJaccardDups(spark, sf)
      .filter($"inter" * 10 >= $"uni" * 9) // jaccard ≥ 0.9
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exhaustive.nonEmpty, "corpus should contain planted near-dups")
    assert(exhaustive.subsetOf(lsh),
      s"LSH missed ${exhaustive -- lsh} (banding should catch j≥0.9 pairs here)")
  }

  test("ShingleGenerator matches the composable explode(shingleArray) form") {
    import graft.functions.TextFns
    val toks = TextFns.tokenize($"text")
    val base = Tables.documents(spark, sf)
      .select($"doc_id", toks.as("toks"))
    val viaGen = base.select($"doc_id",
      graft.plans.ShingleGenerator.shingles($"toks", 5).as("shingle"))
    val viaHof = base.select($"doc_id",
      explode(TextFns.shingleArray($"toks", 5)).as("shingle"))
    assert(viaGen.exceptAll(viaHof).count() === 0)
    assert(viaHof.exceptAll(viaGen).count() === 0)
    // generator also yields zero rows for short docs
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
      .select($"doc_id", TextFns.tokenize($"text").as("toks"))
      .select(graft.plans.ShingleGenerator.shingles($"toks", 3))
    assert(short.count() === 0)
  }

  test("jaccard output is symmetric-canonical (a<b) and within bounds") {
    val bad = Dedup.ngramJaccardDups(spark, sf)
      .filter($"doc_a" >= $"doc_b" || $"inter" <= 0 || $"inter" > $"uni")
      .count()
    assert(bad === 0)
  }

  test("exact dedup: identical texts share fp and get distinct ranks") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val out = df.select($"doc_id", md5($"text").as("fp"))
      .withColumn("n_copies", count(lit(1)).over(byFp))
      .withColumn("dup_rank", row_number().over(byFp.orderBy("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    assert(out === Set((1L, 2L, 1), (2L, 2L, 2), (3L, 1L, 1)))
  }

  test("simhash: near-identical docs collide, disjoint docs don't (fixture)") {
    val planted = Dedup.minhashNearDups(spark, sf)
      .filter($"inter" * 100 >= $"uni" * 97).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    val sig = Dedup.simhash(spark, sf).as[(Long, Long)].collect().toMap
    // j≥0.97 pairs agree on ≥14 of 16 simhash bits (weighted-majority stability)
    planted.foreach { case (a, b) =>
      val ham = java.lang.Long.bitCount(sig(a) ^ sig(b))
      assert(ham <= 2, s"pair ($a,$b) hamming $ham too far for near-identical docs")
    }
  }
}
