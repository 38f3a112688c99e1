package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.Sf

  test("labelOutliers: planted far vector ranks first in its label") {
    val vecs = Seq(
      (0L, Seq(0f, 0f), 0L),
      (1L, Seq(2f, 0f), 0L),
      (2L, Seq(10f, 10f), 0L),   // the planted outlier
      (3L, Seq(1f, 1f), 1L),
      (4L, Seq(1f, 1f), 1L))     // identical pair: dist 0, id tiebreak
    val dir = java.nio.file.Files.createTempDirectory("graft_outlier").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.labelOutliers(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // label 0 centroid = (4, 10/3): dists 2→~8.97, 0→~5.21, 1→~3.89
    assert(got.filter(_._1 == 0L).map(r => (r._2, r._3)) ===
      Seq((2L, 1L), (0L, 2L), (1L, 3L)))
    // label 1: both AT the centroid, dist exactly 0, vec_id breaks the tie
    assert(got.filter(_._1 == 1L) === Seq((1L, 3L, 1L, 0.0), (1L, 4L, 2L, 0.0)))
    // distances are non-increasing within each label
    got.groupBy(_._1).values.foreach { rows =>
      val ds = rows.sortBy(_._3).map(_._4)
      assert(ds === ds.sorted.reverse)
    }
  }

  test("labelOutliers: every corpus label emits exactly k ranked rows") {
    val got = Similarity.labelOutliers(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val labels = got.map(_._1).distinct
    assert(labels.size === 10)
    labels.foreach { l =>
      val rows = got.filter(_._1 == l)
      assert(rows.map(_._3) === (1L to 10L), s"label $l ranks 1..10")
    }
  }
}
