package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema, metadata, batched stub decode. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("asMedia wraps a column as (content, meta) with byte counts") {
    val df = Seq((1L, "abcd"), (2L, "xy")).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "payload", "image", "raw")
    val metas = media.select(col("meta.kind"), col("meta.n_bytes"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(metas == Seq(("image", 4L), ("image", 2L)))
  }

  test("extractFeatures is deterministic and batch-shaped") {
    val df = Seq((1L, "abcd"), (2L, "xy")).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "payload", "image", "raw")
    val f1 = Multimodal.extractFeatures(media, "id").orderBy("id").collect()
    val f2 = Multimodal.extractFeatures(media, "id").orderBy("id").collect()
    assert(f1.sameElements(f2))
    assert(f1.map(_.getLong(1)).toSeq == Seq(4L, 2L)) // n_bytes
    assert(f1.forall(r => r.getInt(3) >= 16 && r.getInt(4) >= 16)) // stub dims
    // pin the declared checksum: Σ byte_i × ((i mod 64) + 1), 0-indexed —
    // "abcd" → 97·1 + 98·2 + 99·3 + 100·4 = 990 (the SQL-oracle contract)
    assert(f1.head.getLong(2) == 990L)
    assert(f1.head.getInt(3) == 16 + 990 % 1024)
  }

  test("resizeStub fits the bounding box preserving aspect ratio") {
    val feats = Seq((1L, 1000, 500), (2L, 100, 50)).toDF("id", "width", "height")
    val out = Multimodal.resizeStub(feats, maxDim = 200)
      .select("id", "out_width", "out_height")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(out == Seq((1L, 200, 100), (2L, 100, 50))) // small images untouched
  }

  test("frameSample emits strided frame offsets; sub-frame payloads drop out") {
    val df = Seq((1L, "a" * 1000), (2L, "b" * 100)).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "payload", "video", "raw")
    val out = Multimodal.frameSample(media, "id", frameBytes = 256L, stride = 2)
      .select("id", "frame_idx", "byte_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 1000 bytes / 256 = 3 frames → idx 0, 2; 100 bytes → 0 frames
    assert(out == Seq((1L, 0L, 0L), (1L, 2L, 512L)))
  }
}
