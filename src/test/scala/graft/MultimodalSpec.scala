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
    assert(f1.forall(_.isNullAt(3))) // text payloads: no image format
    assert(f1.forall(r => r.getInt(4) >= 16 && r.getInt(5) >= 16)) // stub dims
    // pin the declared checksum: Σ byte_i × ((i mod 64) + 1), 0-indexed —
    // "abcd" → 97·1 + 98·2 + 99·3 + 100·4 = 990 (the SQL-oracle contract)
    assert(f1.head.getLong(2) == 990L)
    assert(f1.head.getInt(4) == 16 + 990 % 1024)
  }

  test("decodeImage parses PNG/JPEG/GIF/BMP headers; junk and truncation are None") {
    // PNG round-trip through our own minimal writer
    assert(Multimodal.decodeImage(Multimodal.pngBytes(640, 480))
      .contains(("png", 640, 480)))
    // JPEG: SOI, APP0 (JFIF), then SOF0 with height 321 / width 481
    val jpeg = Array(
      0xff, 0xd8, 0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0x41, 0x01, 0xe1, 0x03,
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
    assert(Multimodal.decodeImage(jpeg).contains(("jpeg", 0x01e1, 0x0141)))
    // GIF89a little-endian logical screen size
    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array(0x20, 0x01, 0x90, 0x00, 0, 0, 0, 0).map(_.toByte))
    assert(Multimodal.decodeImage(gif).contains(("gif", 288, 144)))
    // BMP with the 40-byte DIB header; negative height = top-down rows
    val bmp = new Array[Byte](30)
    bmp(0) = 'B'; bmp(1) = 'M'; bmp(14) = 40
    bmp(18) = 0x40; bmp(19) = 0x01 // width 320 LE
    bmp(22) = 0xc8.toByte; bmp(23) = 0xff.toByte
    bmp(24) = 0xff.toByte; bmp(25) = 0xff.toByte // height -56 → 56
    assert(Multimodal.decodeImage(bmp).contains(("bmp", 320, 56)))
    // not images / truncated headers
    assert(Multimodal.decodeImage("plain text".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Multimodal.pngBytes(2, 2).take(20)).isEmpty)
    assert(Multimodal.decodeImage(Array(0xff, 0xd8, 0xff).map(_.toByte)).isEmpty)
  }

  test("extractFeatures reports real dimensions for image payloads, null format else") {
    val df = Seq((1L, 31, 17), (2L, 1023, 511)).toDF("id", "w", "h")
    val png = df.select(col("id"),
      Multimodal.pngContent(col("w"), col("h")).as("content"))
    val out = Multimodal.extractFeatures(png, "id").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3),
        r.getInt(4), r.getInt(5))).toSeq
    assert(out == Seq((1L, 33L, "png", 31, 17), (2L, 33L, "png", 1023, 511)))
    // mixed corpus: the non-image row falls back, the image row decodes
    val mixed = Seq((1L, Multimodal.pngBytes(8, 4)),
      (2L, "not an image".getBytes)).toDF("id", "content")
    val feats = Multimodal.extractFeatures(mixed, "id").orderBy("id").collect()
    assert(feats(0).getString(3) == "png" && feats(0).getInt(4) == 8)
    assert(feats(1).isNullAt(3))
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

  test("patchify: grid cover with clipped edges, area identity") {
    val dims = Seq((1L, 33L, 20L)).toDF("id", "w", "h") // 3x2 patch grid
    val out = Multimodal.patchify(dims, "id", "w", "h", 16)
      .select("patch_id", "x0", "y0", "pw", "ph")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(out.size == 6)
    assert(out.head == ((0L, 0L, 0L, 16L, 16L)))
    assert(out(2) == ((2L, 32L, 0L, 1L, 16L)))  // right edge clipped to 1
    assert(out(5) == ((5L, 32L, 16L, 1L, 4L)))  // corner clipped both ways
    // the patches tile the image exactly: areas sum to w*h
    assert(out.map(p => p._4 * p._5).sum == 33L * 20L)
  }

  test("contrastivePairs: one positive + k negatives per item, never the " +
       "own caption, reproducible, dense-id gate is loud") {
    import spark.implicits._
    val caps = (0L until 20L).map(i => (i, s"cap$i")).toDF("doc_id", "text")
    val items = (0L until 20L).toDF("doc_id")
    val out = graft.pipeline.Multimodal.contrastivePairs(
        items, caps, "doc_id", "text", negatives = 3, seed = 5L)
      .select("doc_id", "pair_j", "is_positive", "caption").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getString(3)))
    assert(out.length == 20 * 4)
    val byItem = out.groupBy(_._1)
    byItem.foreach { case (id, rows) =>
      val pos = rows.filter(_._3)
      assert(pos.length == 1 && pos.head._4 == s"cap$id")
      // negatives never the own caption
      assert(rows.filterNot(_._3).forall(_._4 != s"cap$id"), rows.mkString(","))
    }
    // reproducible; seed change redraws at least one negative
    val again = graft.pipeline.Multimodal.contrastivePairs(
        items, caps, "doc_id", "text", negatives = 3, seed = 5L)
      .select("doc_id", "pair_j", "caption").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)).toString).sorted
    val a1 = out.map(r => (r._1, r._2, r._4).toString).sorted
    assert(a1.sameElements(again))
    val other = graft.pipeline.Multimodal.contrastivePairs(
        items, caps, "doc_id", "text", negatives = 3, seed = 6L)
      .select("doc_id", "pair_j", "caption").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)).toString).sorted
    assert(!a1.sameElements(other))
    // sparse caption ids are rejected, not silently mis-drawn
    val sparse = Seq((0L, "a"), (5L, "b")).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException](
      graft.pipeline.Multimodal.contrastivePairs(items, sparse, "doc_id", "text"))
      .getMessage.contains("dense"))
  }
}
