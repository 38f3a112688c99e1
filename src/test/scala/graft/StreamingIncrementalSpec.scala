package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** True incremental streaming semantics — multiple micro-batches through
  * MemoryStream, verifying state carries across batches (not just a
  * one-shot drain of a finite source).
  */
class StreamingIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming dropDuplicates dedups across micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val deduped = input.toDS().toDF("id", "fp").dropDuplicates("fp")
    val q = deduped.writeStream.format("memory")
      .queryName("inc_dedup").outputMode("append").start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.table("inc_dedup").count() === 2)
      // batch 2 re-sends fp "b": state from batch 1 must suppress it
      input.addData((3L, "b"), (4L, "c"))
      q.processAllAvailable()
      val out = spark.table("inc_dedup").select("fp").as[String].collect().sorted
      assert(out.toSeq === Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("sessionizeStreaming: session spans batches, flushes once via timeout") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.EvT
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val gapUs = 30L * 60 * 1000 * 1000 // 30 min
    val input = MemoryStream[EvT]
    val q = StreamingOps.sessionizeStreaming(input.toDS(), gapUs)
      .writeStream.format("memory").queryName("inc_sess")
      .outputMode("append").start()
    try {
      // batch 1: user 1 opens a session (2 events)
      input.addData(EvT(1L, t("10:00:00"), 1.0), EvT(1L, t("10:05:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("inc_sess").count() === 0, "open session must stay in state")
      // batch 2: same session continues across the batch boundary
      input.addData(EvT(1L, t("10:10:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("inc_sess").count() === 0,
        "still-open session must not be re-emitted per batch")
      // batch 3: an unrelated user pushes the watermark past 10:40
      // (last event + gap); the engine's watermark-advance micro-batch
      // fires the timeout and flushes user 1's session — exactly once,
      // closed by TIMEOUT, not by any user-1 event
      input.addData(EvT(2L, t("12:00:00"), 1.0))
      q.processAllAvailable()
      val sess = spark.table("inc_sess")
        .as[StreamingOps.SessionOut].collect()
      assert(sess.length === 1)
      assert(sess.head.user_id === 1L && sess.head.n_events === 3L)
      assert(sess.head.start_us === t("10:00:00").getTime * 1000 &&
        sess.head.end_us === t("10:10:00").getTime * 1000)
      // batch 4: nothing re-emits user 1's flushed session
      input.addData(EvT(3L, t("13:00:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("inc_sess").as[StreamingOps.SessionOut]
        .filter(_.user_id == 1L).count() === 1)
    } finally q.stop()
  }

  test("dedupedIngest appends only first-seen docs to the parquet corpus") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_ingest")
      .resolve("corpus").toString
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.dedupedIngest(
      input.toDS().toDF("doc_id", "text"), out)
    try {
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      // batch 2 re-sends "beta" (cross-batch state) and adds "gamma"
      input.addData((4L, "beta"), (5L, "gamma"))
      q.processAllAvailable()
      val got = spark.read.parquet(out).select("text").as[String].collect().sorted
      assert(got.toSeq === Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("nearDupIngest drops LSH near-dups across and within micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_neardup")
    val (corpus, bands) = (s"$tmp/corpus", s"$tmp/bands")
    val base = "spark table scan filter join group order sort merge hash key value row column batch stream"
    val other = "customer orders line part region nation supplier query window vector data big small slow"
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.nearDupIngest(
      input.toDS().toDF("doc_id", "text"), corpus, bands)
    try {
      // batch 1: base doc, a novel doc, and a within-batch copy of base
      input.addData((10L, base), (11L, other), (14L, base))
      q.processAllAvailable()
      // batch 2: a near-identical variant of base (cross-batch dup) + novel
      input.addData((12L, base.replace("batch", "fast")),
        (13L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      q.processAllAvailable()
      val kept = spark.read.parquet(corpus)
        .select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq === Seq(10L, 11L, 13L),
        "within-batch copy (14), cross-batch near-dup (12) must be dropped")
    } finally q.stop()
  }

  test("windowed aggregation accumulates counts across micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val agg = input.toDS().toDF("ts", "event_type")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(date_format($"w.start", "HH:mm").as("h"), $"event_type", $"n")
    val q = agg.writeStream.format("memory")
      .queryName("inc_win").outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    try {
      input.addData((t("10:05:00"), "x"), (t("10:20:00"), "x"))
      q.processAllAvailable()
      input.addData((t("10:40:00"), "x"), (t("11:10:00"), "y"))
      q.processAllAvailable()
      val rows = spark.table("inc_win")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // the 10:00 window's count grew 2 → 3 across batches
      assert(rows === Set(("10:00", "x", 3L), ("11:00", "y", 1L)))
    } finally q.stop()
  }
}
