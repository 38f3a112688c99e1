package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.Sf

  test("binary payload length equals n_chars (ASCII corpus)") {
    val bad = Multimodal.binaryMeta(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
      .filter($"byte_len" =!= $"n_chars").count()
    assert(bad === 0)
  }

  test("stubbed decoder is deterministic and schema-complete") {
    val a = Multimodal.imageFeatures(spark, sf).collect()
    val b = Multimodal.imageFeatures(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(m => m.n_pixels === m.width.toLong * m.height * m.channels))
  }

  test("frame sampling: n_frames rows per doc, offsets within payload") {
    val frames = Multimodal.frameSample(spark, sf)
    val bad = frames.join(Multimodal.binaryMeta(spark, sf), "doc_id")
      .filter($"frame_offset" < 0 || $"frame_offset" >= $"byte_len").count()
    assert(bad === 0)
    val counts = frames.groupBy("doc_id").count()
      .join(Multimodal.binaryMeta(spark, sf), "doc_id")
      .filter($"count" =!= ($"byte_len" % 5 + 1)).count()
    assert(counts === 0)
  }

  test("payloadEnergy: hand-computed byte energy on planted payloads") {
    // "AB" = bytes 65, 66 → one window: (65-128)² + (66-128)² = 3969 + 3844
    val docs = Seq((1L, "AB"), (2L, "")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_energy").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.payloadEnergy(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // empty payload is out of domain; 2-byte payload is one short window
    assert(got === Seq((1L, 2L, 1L, 7813L, 7813L)))
    // a 100-byte payload spans two 64-byte windows
    val docs2 = Seq((1L, "x" * 100)).toDF("doc_id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("graft_energy2").toString
    docs2.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val g2 = Multimodal.payloadEnergy(spark, dir2)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // 'x' = 120 → (120-128)² = 64 per byte; windows of 64 and 36 bytes
    assert(g2 === ((1L, 100L, 2L, 6400L, 4096L)))
  }

  test("formatSniff detects the planted signatures and knows its own limits") {
    val got = Multimodal.formatSniff(spark, sf)
      .select("doc_id", "fmt", "sig_len", "n_bytes")
      .as[(Long, String, Long, Long)].collect()
    assert(got.nonEmpty)
    val nArms = Multimodal.PlantTable.length
    val byPick = got.groupBy(r => (r._1 % nArms).toInt)
    // each planted arm detects as ITS format, the unplanted arm as unknown
    val want = Multimodal.MagicTable.map(_._2)
    want.zipWithIndex.foreach { case (f, i) =>
      assert(byPick(i).forall(_._2 == f), s"arm $i should sniff $f")
      assert(byPick(i).forall(_._3 == Multimodal.MagicTable(i)._1.length / 2))
    }
    // the RIFF container arms route one level deeper: a full 12-byte
    // RIFF+size+subtype header identifies as the CONTAINED format, with
    // all 12 header bytes consumed; the bare-RIFF arm above stays "riff"
    // at sig_len 4 (its subtype bytes are corpus text, not WAVE/AVI)
    Multimodal.RiffSubtypes.map(_._2).zipWithIndex.foreach { case (f, j) =>
      val arm = want.length + j
      assert(byPick(arm).forall(_._2 == f), s"arm $arm should sniff $f")
      assert(byPick(arm).forall(_._3 == 12L))
    }
    assert(byPick(nArms - 1).forall(r => r._2 == "unknown" && r._3 == 0L))
    // n_bytes = planted signature + the text's bytes
    val meta = Multimodal.binaryMeta(spark, sf)
      .select("doc_id", "byte_len").as[(Long, Long)].collect().toMap
    got.foreach { case (id, _, sigLen, n) =>
      assert(n === meta(id) + sigLen, s"doc $id")
    }
    // detection is independent of the planting machinery: a doc whose
    // TEXT bytes already start with a magic prefix is sniffed with
    // nothing planted ("%PDF" is pure ASCII, the one signature plain
    // text can carry)
    val rawArm = Multimodal.PlantTable.length.toLong - 1L
    val docs = Seq(rawArm -> "%PDF-1.4 rest of the file").toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_sniff").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // doc_id = the raw arm -> nothing planted, yet the bytes ARE a PDF header
    val sniffed = Multimodal.formatSniff(spark, dir)
      .select("fmt").as[String].collect().toSeq
    assert(sniffed === Seq("pdf"))
  }

  test("native ByteWindowEnergy equals the composable hex+conv HOF form") {
    // the ShingleGenerator pattern: the codegen Expression must stay
    // provably equal to the form any Spark user could compose — over the
    // real corpus (every payload, every window boundary), all columns
    val sf = TestSpark.Sf
    val native = Multimodal.payloadEnergy(spark, sf)
    val hof = Multimodal.payloadEnergyHof(spark, sf)
    assert(native.count() > 0)
    assert(native.count() === hof.count())
    assert(native.join(hof,
      Seq("doc_id", "n_bytes", "n_windows", "total_energy", "peak_energy"),
      "left_anti").count() === 0)
  }
}
