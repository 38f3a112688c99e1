package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming counterparts of the batch event analytics: the same
  * declarative aggregates run incrementally over an unbounded source with
  * watermarked state. The reference is strictly batch (SURVEY §2.1) — this
  * is extension surface, exercised by ScalaTest (the driver harness is
  * batch-only).
  *
  * At scale: the hourly aggregate keeps one state row per (window, type)
  * and the watermark bounds state size; sessionization keeps one state row
  * per active user and emits sessions on gap timeout.
  */
object StreamingOps {

  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked hourly tumbling counts per event type — the streaming twin
    * of operators.Events.hourlyByType.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"))

  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class SessionState(sessionId: Long, startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** Gap-based sessionization with explicit per-user state
    * (flatMapGroupsWithState): closes and emits a session whenever the next
    * event arrives more than `gapUs` after the last one. In batch mode the
    * group's full event list arrives at once (Spark runs the same function);
    * in streaming mode state persists across micro-batches.
    */
  def sessionize(events: Dataset[Ev], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[Ev],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var st = state.getOption.orNull
      evs.toSeq.sortBy(e => e.ts_us).foreach { e =>
        if (st == null) {
          st = SessionState(1L, e.ts_us, e.ts_us, 1L)
        } else if (e.ts_us - st.lastUs > gapUs) {
          out += SessionOut(userId, st.sessionId, st.n, st.startUs, st.lastUs)
          st = SessionState(st.sessionId + 1, e.ts_us, e.ts_us, 1L)
        } else {
          st = st.copy(lastUs = e.ts_us, n = st.n + 1)
        }
      }
      if (st != null) {
        state.update(st)
        // Emit the trailing session too: correct for batch (the group is
        // complete); a streaming deployment would instead hold it in state
        // and flush on EventTimeTimeout to avoid re-emission.
        out += SessionOut(userId, st.sessionId, st.n, st.startUs, st.lastUs)
      }
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Drain a streaming DataFrame into a named in-memory table and return it
    * (test helper: parquet-backed batch drives the streaming query
    * synchronously via processAllAvailable).
    */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      mode: String = "complete"): DataFrame = {
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
