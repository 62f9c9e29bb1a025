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
  }
}
