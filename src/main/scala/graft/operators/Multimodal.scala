package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted inside partition-parallel typed
  * closures.
  *
  * This container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (byte-length arithmetic standing in for a real
  * decoder — clearly marked below). Everything around it is the real
  * production shape: binary payload column, per-partition batch iteration
  * via `mapPartitions` over a typed Dataset (the Scala analogue of
  * `mapInPandas` — one closure instance per partition, streaming batches,
  * no per-row UDF dispatch), explicit output schema via case-class
  * Encoders, and frame-sampling as a generator (posexplode).
  */
object Multimodal {

  /** A decoded-media metadata record (the stub "decoder" output). */
  case class ImageMeta(doc_id: Long, width: Int, height: Int, channels: Int,
      n_pixels: Long)

  /** Binary payload + integrity metadata per document (the `documents`
    * table's text plays the role of raw media bytes).
    */
  def binaryPayloads(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("fp", md5(col("payload")))

  /** Metadata projection (oracle-checkable: md5/length are byte-exact). */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    binaryPayloads(spark, dir)
      .select("doc_id", "byte_len", "fp")
      .orderBy("doc_id")

  /** "Decode" every payload per-partition into typed image metadata.
    *
    * STUB DECODER: width/height derive from byte length (deterministic
    * fake). A real deployment replaces ONLY the body of `decode` with e.g.
    * javax.imageio / ffmpeg bindings; the Spark plumbing (binary column in,
    * partition-wise iteration, case-class Encoder out) is unchanged.
    */
  def imageFeatures(spark: SparkSession, dir: String): Dataset[ImageMeta] = {
    import spark.implicits._
    def decode(id: Long, bytes: Array[Byte]): ImageMeta = {
      // --- stub: real decoder goes here ---
      val w = 16 + (bytes.length % 32)
      val h = 16 + ((bytes.length * 7) % 32)
      ImageMeta(id, w, h, 3, w.toLong * h * 3)
    }
    binaryPayloads(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decode(id, bytes) })
      .orderBy("doc_id")
  }

  /** Sample "frames" from each payload: frame count and offsets derive from
    * byte length (generator shape: one row per sampled frame).
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val nFrames = (col("byte_len") % 5 + 1).cast("int")
    binaryPayloads(spark, dir)
      .withColumn("n_frames", nFrames)
      .select(col("doc_id"), col("byte_len"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("pos", "frame_idx")))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * expr("byte_len div n_frames")).cast("long")
          .as("frame_offset"))
      .orderBy("doc_id", "frame_idx")
  }
}
