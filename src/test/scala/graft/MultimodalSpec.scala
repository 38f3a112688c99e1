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
}
