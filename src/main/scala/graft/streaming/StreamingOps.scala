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
    * event arrives more than `gapUs` after the last one. BATCH ONLY: the
    * trailing open session is emitted at the end of the (complete) group,
    * which is correct when the group arrives at once but would re-emit a
    * still-open session every micro-batch under true streaming — use
    * sessionizeStreaming for that.
    */
  def sessionize(events: Dataset[Ev], gapUs: Long): Dataset[SessionOut] = {
    require(!events.isStreaming,
      "sessionize is batch-only (re-emits the open trailing session); " +
        "use sessionizeStreaming for incremental input")
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

  case class EvT(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** True incremental sessionization: state persists across micro-batches,
    * sessions are emitted EXACTLY ONCE — either closed by a later event of
    * the same user (gap exceeded) or flushed by EventTimeTimeout once the
    * watermark passes last-event + gap. The trailing open session is held
    * in state, never re-emitted per batch (the failure mode of running the
    * batch variant incrementally).
    *
    * `delay` is the watermark delay (lateness tolerance); timeout fires
    * when `watermark > last event + gap`, so a session's flush latency is
    * bounded by gap + delay + one micro-batch.
    */
  def sessionizeStreaming(events: Dataset[EvT], gapUs: Long,
      delay: String = "0 seconds"): Dataset[SessionOut] = {
    require(events.isStreaming,
      "sessionizeStreaming is streaming-only (trailing sessions flush on " +
        "EventTimeTimeout, which never fires in batch — open sessions would " +
        "be silently dropped); use sessionize for batch input")
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[EvT],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (!evs.hasNext && state.hasTimedOut) {
        val st = state.get
        state.remove()
        return Iterator.single(
          SessionOut(userId, st.sessionId, st.n, st.startUs, st.lastUs))
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var st = state.getOption.orNull
      evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val us = e.ts.getTime * 1000L
        if (st == null) {
          st = SessionState(1L, us, us, 1L)
        } else if (us - st.lastUs > gapUs) {
          out += SessionOut(userId, st.sessionId, st.n, st.startUs, st.lastUs)
          st = SessionState(st.sessionId + 1, us, us, 1L)
        } else {
          // cross-batch out-of-order events (tolerated by `delay`) may sort
          // before the stored last event: extend bounds monotonically, never
          // move lastUs backward (it drives the gap split AND the timeout)
          st = st.copy(startUs = math.min(st.startUs, us),
            lastUs = math.max(st.lastUs, us), n = st.n + 1)
        }
      }
      if (st != null) {
        state.update(st)
        // flush the open session once the watermark proves no more events
        // can extend it (setTimeoutTimestamp takes epoch-millis). Clamp
        // above the current watermark: a late event can put last+gap at or
        // below it, and setTimeoutTimestamp(<= watermark) throws, killing
        // the whole query — clamping instead flushes on the next advance.
        state.setTimeoutTimestamp(math.max(
          st.lastUs / 1000L + gapUs / 1000L,
          state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Continuous corpus ingestion with exact dedup: fingerprint each doc
    * (md5, the q21 contract), drop duplicates STATEFULLY across
    * micro-batches, and append survivors to a parquet corpus directory via
    * foreachBatch — the streaming twin of exactDedup + writeParquet, and
    * the front door of the dedup ladder (BASELINE-notes.md: collapse
    * verbatim copies first). In production add a watermark on an event-time
    * column so the dedup state is bounded; unbounded here because the test
    * corpus is finite.
    */
  def dedupedIngest(docs: DataFrame, path: String,
      options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.withColumn("fp", md5(col("text")))
      .dropDuplicates("fp")
      .writeStream
      // idempotent per-batch landing: a retried micro-batch OVERWRITES its
      // own batch=N directory instead of double-appending; readers see the
      // batch id as a discovered partition column on `path`
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .outputMode("append")
      .options(options) // pass checkpointLocation here for restartable state
      .start()

  /** Streaming NEAR-dup ingestion: per micro-batch, compute MinHash band
    * buckets for incoming (doc_id, text) docs and drop any doc whose
    * bucket collides with the already-ingested corpus (or with a
    * lower-id batchmate); survivors land in `corpusDir` and their bands
    * in `bandsDir`, both as per-batch overwrite dirs so retries are
    * idempotent — and the store read filters `batch < batchId` so a
    * retried batch never sees its own earlier attempt. LSH-approximate by
    * design (candidate collision = duplicate, no Jaccard verify): the
    * streaming trade — exact verification would need the stored shingle
    * sets; run the batch verifier over the corpus periodically to audit.
    */
  def nearDupIngest(docs: DataFrame, corpusDir: String, bandsDir: String,
      options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val bands = graft.operators.Dedup.bandBucketsFor(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // the store counts as present only when it holds COMMITTED parquet
        // files: a failed first write can leave the directory existing but
        // empty, and a bare-existence check would then crash-loop every
        // retry on schema inference. Beyond that, read failures (e.g. a
        // corrupt file) must surface — swallowing them would silently
        // disable cross-batch dedup forever after.
        val bandsPath = new org.apache.hadoop.fs.Path(bandsDir)
        val fs = bandsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val hasData = fs.exists(bandsPath) && Option(fs.globStatus(
          new org.apache.hadoop.fs.Path(bandsDir, "batch=*/*.parquet")))
          .exists(_.nonEmpty)
        val store =
          if (!hasData)
            spark.emptyDataFrame.select(lit(0).as("band"), lit("").as("bucket"))
          else spark.read.parquet(bandsDir)
            .filter(col("batch") < batchId)
            .select("band", "bucket")
        val dupVsStore = bands
          .join(store, Seq("band", "bucket"), "left_semi")
          .select("doc_id")
        val dupInBatch = bands.as("x")
          .join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") > col("y.doc_id"))
          .select(col("x.doc_id").as("doc_id"))
        // persisted: the corpus write and the bands write are separate
        // jobs, and without this the store scan + both joins run twice
        val drop = dupVsStore.union(dupInBatch).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        batch.join(drop, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
        bands.join(drop, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$bandsDir/batch=$batchId")
        drop.unpersist()
        bands.unpersist()
        ()
      }
      .outputMode("append")
      .options(options)
      .start()

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
