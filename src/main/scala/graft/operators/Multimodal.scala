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

  /** q94's energy window in bytes — OracleSql interpolates this same
    * constant into the q94 SQL, so a width change can never desync the
    * Spark side from the oracle.
    */
  val EnergyWindow = 64

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

  /** Windowed byte-level signal energy (q94) — the PCM-energy shape over
    * the binary payload, computed EXACTLY: bytes decode via hex (both
    * engines agree byte-for-byte on UTF-8), each 64-byte window sums
    * (b−128)² in integers, and the per-doc report carries window count,
    * total and peak energy. Unlike the stub decoders above, nothing here
    * is faked — this is the real "cheap feature from raw media bytes"
    * computation (silence/energy gating runs exactly like this on PCM
    * audio before any model sees it). Empty payloads are out of domain.
    * A real deployment swaps the hex-string byte access for a binary
    * slice inside mapPartitions; the aggregation shape is unchanged.
    */
  def payloadEnergy(spark: SparkSession, dir: String,
      window: Int = Multimodal.EnergyWindow): DataFrame = {
    // Per-ROW window energies, no explode: a byte-grain posexplode
    // shuffles one row per payload byte (17.5M rows at sf0.1×10 —
    // measured 4.5 s); energy gating is embarrassingly parallel per
    // payload, so the whole computation stays inside one projection and
    // the only exchange is the edge sort. The window array comes from
    // the native codegen ByteWindowEnergy over the raw binary — see that
    // expression's scaladoc for why the composable hex+conv HOF forms
    // lose (lambda bodies re-decode per reference; CollapseProject
    // inlines any "decode once" helper column back into the lambdas).
    // Integer sums are order-free, so the oracle's explode-form SQL
    // stays valid verbatim; payloadEnergyHof keeps the composable
    // reference for the differential test.
    binaryPayloads(spark, dir)
      .filter(col("byte_len") > 0)
      .select(col("doc_id"), col("payload"), col("byte_len"))
      .withColumn("es", graft.plans.ByteWindowEnergy(col("payload"), window))
      .select(col("doc_id"), col("byte_len").as("n_bytes"),
        size(col("es")).cast("long").as("n_windows"),
        aggregate(col("es"), lit(0L), (acc, e) => acc + e).as("total_energy"),
        array_max(col("es")).as("peak_energy"))
      .orderBy("doc_id")
  }

  /** Composable higher-order-function reference for payloadEnergy's
    * window array (hex + conv + nested folds) — kept ONLY as the
    * differential-test twin of plans.ByteWindowEnergy (the
    * ShingleGenerator pattern: the native Expression must stay
    * provably equal to the form any Spark user could write).
    * byte_len = 0 must not reach sequence(): Spark's sequence(0, -1)
    * auto-steps DOWNWARD, so callers filter empties first.
    */
  private[graft] def payloadEnergyHof(spark: SparkSession, dir: String,
      window: Int = Multimodal.EnergyWindow): DataFrame = {
    val wins = expr(
      s"""transform(
         |  sequence(0, cast((byte_len + ${window - 1}) div $window as int) - 1),
         |  w -> aggregate(
         |    sequence(cast($window * w as int),
         |             cast(least($window * w + ${window - 1}, byte_len - 1) as int)),
         |    0L,
         |    (acc, i) -> acc + (cast(conv(substring(hx, 2 * i + 1, 2), 16, 10) as bigint) - 128L)
         |               * (cast(conv(substring(hx, 2 * i + 1, 2), 16, 10) as bigint) - 128L)))""".stripMargin)
    binaryPayloads(spark, dir)
      .filter(col("byte_len") > 0)
      .select(col("doc_id"), hex(col("payload")).as("hx"), col("byte_len"))
      .withColumn("es", wins)
      .select(col("doc_id"), col("byte_len").as("n_bytes"),
        size(col("es")).cast("long").as("n_windows"),
        aggregate(col("es"), lit(0L), (acc, e) => acc + e).as("total_energy"),
        array_max(col("es")).as("peak_energy"))
      .orderBy("doc_id")
  }

  /** The magic-byte table of [[formatSniff]]: (uppercase hex signature,
    * format). Real, public container signatures — PNG/JPEG/GIF/RIFF/PDF/
    * ID3 — matched longest-prefix-first (the list is checked in this
    * order and no entry is a prefix of an earlier one). OracleSql
    * interpolates THIS table into the q127 SQL, so the signature set can
    * never desync from the oracle.
    */
  val MagicTable: Seq[(String, String)] = Seq(
    "89504E470D0A1A0A" -> "png",
    "FFD8FF" -> "jpeg",
    "47494638" -> "gif",
    "52494646" -> "riff",
    "25504446" -> "pdf",
    "494433" -> "mp3")

  /** RIFF is a CONTAINER: bytes 0–3 say "RIFF", bytes 4–7 are the chunk
    * size, and bytes 8–11 name the contained format — so a real router
    * sniffs one level deeper (r19, verdict r18 item 4): (uppercase hex
    * of payload bytes 9–12, routed format). A RIFF whose subtype is
    * neither stays "riff" (sig_len 4) — quarantine-the-container, the
    * honest answer for RIFF types the table doesn't know (WebP, CDA...).
    */
  val RiffSubtypes: Seq[(String, String)] = Seq(
    "57415645" -> "wav", // "WAVE"
    "41564920" -> "avi") // "AVI "

  /** A fixed little-endian chunk-size filler for the PLANTED RIFF
    * containers (the size field is not part of detection — any 4 bytes
    * sit there in a real file).
    */
  val RiffSizeHex: String = "24000000"

  /** The planting arms of q127's fixture: one per MagicTable signature,
    * one per RIFF subtype (a full 12-byte RIFF+size+subtype header), and
    * the empty unknown/raw arm. doc_id mod PlantTable.length picks the
    * arm; OracleSql interpolates THIS list so fixture and oracle can
    * never desync.
    */
  val PlantTable: Seq[String] =
    MagicTable.map(_._1) ++
      RiffSubtypes.map { case (sub, _) => "52494646" + RiffSizeHex + sub } :+
      ""

  /** q127 — media-format sniffing over binary payloads: the router a
    * 100 TB multimodal ingest runs BEFORE any decoder — read the first
    * few bytes, dispatch to the right pipeline (or quarantine unknowns).
    * Unlike the stub decoders, nothing here is faked: magic-byte
    * detection IS the production computation, codec-free by nature.
    *
    * The corpus's payloads are text bytes, so known signatures are
    * PLANTED deterministically (the q110 fixture idiom): doc_id mod
    * PlantTable.length picks an arm — a MagicTable signature, a full
    * 12-byte RIFF container header (WAVE / AVI), or nothing (the
    * unknown/raw arm). Detection is INDEPENDENT of the planting — a
    * longest-prefix scan of the payload's leading bytes via one codegen'd
    * hex prefix compare per signature, with RIFF routed one level deeper
    * on the subtype at bytes 9–12 ([[RiffSubtypes]]); the whole operator
    * is a map-side projection (no shuffle below the edge sort), so 100 TB
    * routes partition by partition. Only the first 12 payload bytes are
    * ever hexed (r19, verdict r18: the first cut hexed the WHOLE payload
    * to read ≤8 leading bytes — correct, but a 2× per-row allocation
    * that matters when real payloads are MBs). Output: (doc_id, fmt,
    * sig_len bytes consumed to identify, n_bytes).
    */
  def formatSniff(spark: SparkSession, dir: String): DataFrame = {
    val planted = binaryPayloads(spark, dir)
      .withColumn("_pick", (col("doc_id") % PlantTable.length).cast("int"))
      .select(col("doc_id"),
        concat(
          unhex(element_at(typedlit(PlantTable), col("_pick") + lit(1))),
          col("payload")).as("payload"))
    // 12 bytes cover the longest identification (RIFF header + subtype);
    // substring-then-hex touches only those bytes whatever the payload size
    val hx = upper(hex(substring(col("payload"), 1, 12)))
    // second-level route for the RIFF container: subtype at bytes 9–12
    // (hex chars 17–24), falling back to `base` when the table has no arm
    def riffRoute(pick: String => org.apache.spark.sql.Column,
        base: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      RiffSubtypes.foldRight(base) { case ((sub, f), els) =>
        when(substring(hx, 17, 8) === lit(sub), pick(f)).otherwise(els)
      }
    val fmt = MagicTable.foldRight(lit("unknown")) { case ((sig, f), els) =>
      when(substring(hx, 1, sig.length) === lit(sig),
        if (f == "riff") riffRoute(rf => lit(rf), lit("riff")) else lit(f))
        .otherwise(els)
    }
    val sigLen = MagicTable.foldRight(lit(0L)) { case ((sig, f), els) =>
      when(substring(hx, 1, sig.length) === lit(sig),
        if (f == "riff") riffRoute(_ => lit(12L), lit(4L))
        else lit(sig.length.toLong / 2)).otherwise(els)
    }
    planted
      .select(col("doc_id"), fmt.as("fmt"), sigLen.as("sig_len"),
        length(col("payload")).cast("long").as("n_bytes"))
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
