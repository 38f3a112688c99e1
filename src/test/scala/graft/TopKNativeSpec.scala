package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAggregator

/** The hot queries (q43/q51/q97) use the native CollectTopK bridge; the
  * typed-Aggregator forms remain the API-coverage twins. These tests pin
  * the two implementations equal on adversarial fixtures — score ties
  * (tie-break field must decide), zero scores (the -0.0 produced by key
  * negation must compare equal to 0.0 and round-trip back to 0.0), and
  * groups smaller than k.
  */
class TopKNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val scored = Seq(
    // group 1: tie on score 2.5 → token ascending decides; 4 rows > k
    (1L, "delta", 2.5), (1L, "alpha", 2.5), (1L, "mid", 7.0), (1L, "zz", 1.0),
    // group 2: all zero scores (negation → -0.0) → pure token ordering
    (2L, "c", 0.0), (2L, "a", 0.0), (2L, "b", 0.0), (2L, "d", 0.0),
    // group 3: fewer rows than k
    (3L, "only", 3.25))

  test("native struct(-score, token) top-k == typed topKByScore (k=3)") {
    val df = scored.toDF("doc_id", "token", "tfidf")
    val native = df.groupBy("doc_id")
      .agg(org.apache.spark.sql.GraftBridge.collectTopK(
        struct((-col("tfidf")).as("ns"), col("token")), 3, reverse = true).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("doc_id"), col("pos"), col("t.token").as("token"),
        (-col("t.ns")).as("tfidf"))
      .as[(Long, Int, String, Double)].collect().toSeq.sorted
    val typed = {
      val topk = TopKAggregator.topKByScore(3)
      df.groupBy("doc_id")
        .agg(topk(col("token"), col("tfidf")).as("top"))
        .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("doc_id"), col("pos"), col("t.token").as("token"),
          col("t.tfidf").as("tfidf"))
        .as[(Long, Int, String, Double)].collect().toSeq.sorted
    }
    assert(native === typed)
    // the -0.0 round-trip really lands on +0.0 bits (oracle compares text)
    assert(native.filter(_._1 == 2L).forall(r =>
      java.lang.Double.doubleToRawLongBits(r._4) == 0L))
  }

  test("native struct(-qty, doc_id) top-k == typed topKByQty (k=3)") {
    val df = Seq(
      ("tok1", 10L, 5L), ("tok1", 11L, 5L), ("tok1", 12L, 9L), ("tok1", 13L, 1L),
      ("tok2", 20L, 2L))
      .toDF("token", "doc_id", "qty")
    val native = df.groupBy("token")
      .agg(org.apache.spark.sql.GraftBridge.collectTopK(
        struct((-col("qty")).as("nq"), col("doc_id")), 3, reverse = true).as("top"))
      .select(col("token"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("token"), col("pos"), col("t.doc_id").as("doc_id"),
        (-col("t.nq")).as("qty"))
      .as[(String, Int, Long, Long)].collect().toSeq.sorted
    val typed = {
      val topk = TopKAggregator.topKByQty(3)
      df.groupBy("token")
        .agg(topk(col("doc_id"), col("qty")).as("top"))
        .select(col("token"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("token"), col("pos"), col("t.doc_id").as("doc_id"),
          col("t.qty").as("qty"))
        .as[(String, Int, Long, Long)].collect().toSeq.sorted
    }
    assert(native === typed)
  }

  test("native struct(dist, vec_id) min-k == typed minKByDist (k=2)") {
    val df = Seq(
      (1L, 100L, 0.5), (1L, 101L, 0.5), (1L, 102L, 0.25), (1L, 103L, 9.0),
      (2L, 200L, 1.0))
      .toDF("cluster_id", "vec_id", "dist")
    val native = df.groupBy("cluster_id")
      .agg(org.apache.spark.sql.GraftBridge.collectTopK(
        struct(col("dist"), col("vec_id")), 2, reverse = true).as("top"))
      .select(col("cluster_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("cluster_id"), col("pos"), col("t.vec_id").as("vec_id"),
        col("t.dist").as("dist"))
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    val typed = {
      val topk = TopKAggregator.minKByDist(2)
      df.groupBy("cluster_id")
        .agg(topk(col("vec_id"), col("dist")).as("top"))
        .select(col("cluster_id"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("cluster_id"), col("pos"), col("t.vec_id").as("vec_id"),
          col("t.dist").as("dist"))
        .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    }
    assert(native === typed)
  }
}
