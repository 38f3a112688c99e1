package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events
import graft.streaming.StreamingOps

/** The streaming twins must agree with the batch operators when fed the
  * same (finite) input — parquet-backed streams drained synchronously.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.Sf

  test("streaming hourly counts equal batch hourly counts") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.types._
    // mirror Tables.events' generation handling: sniff the stored ts type
    // (nanos int64 in generations ≤ r9, native µs TIMESTAMP_NTZ from r10)
    // and declare the stream schema + normalization to match
    val rawTs = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", rawTs),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // the file-stream source wants a directory: stage the single file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream0 = spark.readStream.schema(rawSchema).parquet(dir.toString)
    val stream = rawTs match {
      case LongType => stream0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => stream0.withColumn("ts", $"ts".cast(TimestampType))
      case _ => stream0
    }
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.hourlyByType(stream), "hourly_test")
      .select("hour_start", "event_type", "n_events")
    val want = Events.hourlyByType(spark, sf)
      .select("hour_start", "event_type", "n_events")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("streaming DSIR scorer is bit-identical to batch q82 on the same corpus") {
    import org.apache.spark.sql.types._
    // learn the weight table in batch, ship it as a literal map — the
    // deployment shape the operator documents
    val weights = graft.operators.TextAnalysis.dsirWeightTable(spark, sf)
      .as[(Long, Double)].collect().toMap
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(docSchema).parquet(dir.toString)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.dsirScore(stream, weights), "dsir_test", mode = "append")
    val want = graft.operators.TextAnalysis.dsirWeights(spark, sf)
    // EXACT equality, not tolerance: same quantized weights, same
    // bucket-ascending fold, same double ops on both paths
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("streaming PII scrub is bit-identical to batch q110 on the same corpus") {
    import org.apache.spark.sql.types._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("docs_pii_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(docSchema).parquet(dir.toString)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.piiScrubStream(stream), "pii_test", mode = "append")
    val want = graft.operators.TextAnalysis.piiRedaction(spark, sf)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("streaming CMS grid equals the batch q103 cells, cell for cell") {
    import org.apache.spark.sql.types._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("cms_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(docSchema).parquet(dir.toString)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.cmsCells(stream), "cms_test", mode = "complete")
    val want = graft.operators.Sketches.cmsCells(spark, sf)
    // EXACT cell-for-cell equality: same shingle set (array_distinct per
    // doc == the batch relation's distinct (doc, shingle)), same shared
    // bucket hashes, integer counts
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("streaming bloom flags equal batch q102 doc-for-doc on the train split") {
    import org.apache.spark.sql.types._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // stage exactly the batch operator's universe: the train split (the
    // stream twin flags whatever arrives; q102 is scoped to train docs)
    val trainIds = graft.operators.TextAnalysis.hashSplit(spark, sf)
      .filter($"split" === "train").select("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("bloom_stream")
    spark.read.parquet(s"$sf/documents.parquet")
      .join(trainIds, Seq("doc_id"), "left_semi")
      .write.parquet(dir.resolve("train").toString)
    // the deployment sequence: serialize the filter once in batch...
    val bits = graft.operators.Sketches.evalBitsHex(spark, sf)
    // ...then flag the arriving stream per-row, stateless append mode
    val stream = spark.readStream.schema(docSchema)
      .parquet(dir.resolve("train").toString)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.bloomFlagStream(stream, bits), "bloom_flag_test",
      mode = "append")
    val want = graft.operators.Sketches.bloomDecontamination(spark, sf)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("multi-benchmark streaming bloom flags equal batch q125 row-for-row") {
    import org.apache.spark.sql.types._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val trainIds = graft.operators.TextAnalysis.hashSplit(spark, sf)
      .filter($"split" === "train").select("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("mbloom_stream")
    spark.read.parquet(s"$sf/documents.parquet")
      .join(trainIds, Seq("doc_id"), "left_semi")
      .write.parquet(dir.resolve("train").toString)
    // serialize every benchmark's filter once in batch, ship as literals
    val benchBits = graft.operators.Sketches.benchBitsHex(spark, sf)
    assert(benchBits.nonEmpty)
    val stream = spark.readStream.schema(docSchema)
      .parquet(dir.resolve("train").toString)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.bloomFlagMultiStream(stream, benchBits), "mbloom_test",
      mode = "append")
    val want = graft.operators.Sketches.multiBenchDecontamination(spark, sf)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("gopherKeep admits exactly the q75 keep-set (batch-checked on the corpus)") {
    val kept = StreamingOps.gopherKeep(
      Tables.documents(spark, sf).select("doc_id", "text"))
      .select("doc_id").as[Long].collect().toSet
    val want = graft.operators.TextAnalysis.gopherRules(spark, sf)
      .filter(col("keep") === 1L).select("doc_id").as[Long].collect().toSet
    assert(kept === want)
  }

  test("streaming exact-dedup (dropDuplicates on fp) keeps one row per fingerprint") {
    val dir = java.nio.file.Files.createTempDirectory("dedup_stream")
    // duplicate the corpus so the stream really contains dups
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    docs.union(docs).write.mode("overwrite").parquet(dir.toString + "/in")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val deduped = spark.readStream.schema(schema).parquet(dir.toString + "/in")
      .withColumn("fp", md5($"text"))
      .dropDuplicates("fp")
    val got = StreamingOps.runToMemory(spark, deduped, "dedup_test", mode = "append")
    assert(got.count() === docs.select(md5($"text")).distinct().count())
  }

  test("SelfDotRule rewrites graft_dot(x,x) and preserves values bit-exactly") {
    import graft.functions.VectorFns
    val e = Tables.embeddings(spark, sf)
      .select(VectorFns.asDouble($"embedding").as("emb"))
    val normed = e.select(VectorFns.dot($"emb", $"emb").as("sq"))
    val plan = normed.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_self_dot"), s"rule did not fire:\n$plan")
    val viaHof = e.select(VectorFns.dotHof($"emb", $"emb").as("sq"))
    assert(normed.exceptAll(viaHof).count() === 0)
  }

  test("stateful sessionize (batch mode) matches window-function sessions") {
    val evs = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"value")
      .as[StreamingOps.Ev]
    val got = StreamingOps.sessionize(evs, Events.SessionGapUs)
    val want = Events.sessions(spark, sf)
    assert(got.count() === want.count())
    val g = got.select($"user_id", $"session_id", $"n_events", $"start_us", $"end_us")
    val w = want.select($"user_id", $"session_id", $"n_events", $"start_us", $"end_us")
    assert(g.exceptAll(w).count() === 0)
  }
}
