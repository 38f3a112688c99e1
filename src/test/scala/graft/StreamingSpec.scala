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
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // the file-stream source wants a directory: stage the single file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = spark.readStream.schema(rawSchema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.hourlyByType(stream), "hourly_test")
      .select("hour_start", "event_type", "n_events")
    val want = Events.hourlyByType(spark, sf)
      .select("hour_start", "event_type", "n_events")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
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
