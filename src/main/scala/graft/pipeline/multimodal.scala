package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a batched feature-extraction operator.
  *
  * Image decode is REAL at the container-header level: [[decodeImage]]
  * parses PNG / JPEG / GIF / BMP headers (public, deterministic formats)
  * for format + true pixel dimensions — no codec library needed. Pixel
  * DATA decode (sample arrays) would need a real codec and stays out of
  * scope: payloads that aren't a recognized image fall back to
  * [[decodeStub]]'s deterministic checksum-derived pseudo-features with a
  * null format, so the batched operator is total either way.
  */
object Multimodal {

  /** Parse an image container header: `Some((format, width, height))` for
    * PNG / JPEG / GIF / BMP payloads, None otherwise (including truncated
    * headers — a media pipeline must treat corrupt bytes as data, not
    * exceptions). Big-endian PNG/JPEG, little-endian GIF/BMP, per the
    * published specs. */
  def decodeImage(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i).toLong << 24 | u8(i + 1) << 16 | u8(i + 2) << 8 | u8(i + 3)).toInt
    def le16(i: Int) = (u8(i + 1) << 8) | u8(i)
    def le32(i: Int) = (u8(i + 3).toLong << 24 | u8(i + 2) << 16 | u8(i + 1) << 8 | u8(i)).toInt
    if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first SOF (C0-CF minus the
      // non-frame C4/C8/CC); height then width, big-endian, after the
      // segment length and precision bytes
      var i = 2
      while (i + 9 < b.length) {
        if (u8(i) != 0xff) return None // desynced — not a well-formed stream
        val m = u8(i + 1)
        if (m == 0xff) i += 1 // fill byte
        else if (m >= 0xd0 && m <= 0xd9 || m == 0x01) i += 2 // no-payload markers
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return Some(("jpeg", be16(i + 7), be16(i + 5)))
        else i += 2 + be16(i + 2)
      }
      None
    }
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val dib = le32(14)
      if (dib >= 40) Some(("bmp", le32(18), math.abs(le32(22)))) // negative = top-down
      else if (dib == 12) Some(("bmp", le16(18), le16(20))) // BITMAPCOREHEADER
      else None
    }
    else None
  }

  /** A minimal valid-header PNG (signature + IHDR; CRC left zero — header
    * parsers don't verify it) wrapping no pixel data: 33 bytes. Exists so
    * pipelines and the correctness gate can exercise [[decodeImage]]'s real
    * dimension parsing with payloads constructed from row values. */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "png dimensions must be positive")
    val out = new Array[Byte](33)
    val sig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { out(i) = sig(i).toByte; i += 1 }
    out(11) = 13 // IHDR length
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    def be32(at: Int, v: Int): Unit = {
      out(at) = (v >>> 24).toByte; out(at + 1) = (v >>> 16).toByte
      out(at + 2) = (v >>> 8).toByte; out(at + 3) = v.toByte
    }
    be32(16, width); be32(20, height)
    out(24) = 8 // bit depth
    out(25) = 2 // color type: truecolor
    out
  }

  /** Canonical multimodal schema fragment: opaque payload + typed metadata. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),      // image | audio | video
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = true)))

  /** [[pngBytes]] as a pure-SQL Column (binary literals + `unhex(lpad(
    * hex(dim)))` big-endian encoding): per-row PNG construction stays
    * inside whole-stage codegen — used to round-trip [[decodeImage]]
    * against dimension columns without a UDF or a partition pass. */
  def pngContent(width: org.apache.spark.sql.Column,
                 height: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val sig = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = lit(Array[Byte](0, 0, 0, 13, 'I', 'H', 'D', 'R'))
    def be32(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
    // bit depth 8, truecolor, compression/filter/interlace 0, CRC zeroed
    val tail = lit(Array[Byte](8, 2, 0, 0, 0, 0, 0, 0, 0))
    concat(sig, ihdr, be32(width), be32(height), tail)
  }

  /** Wrap a source column as a multimodal (content, meta) pair. */
  def asMedia(df: DataFrame, binCol: String, kind: String, format: String): DataFrame =
    df.withColumn("content", col(binCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(kind).as("kind"),
        length(col(binCol).cast(BinaryType)).cast(LongType).as("n_bytes"),
        lit(format).as("format")))

  /** STUB media decoder: deterministic fake "features" from the payload —
    * byte count, a position-weighted byte checksum (weights cycle 1..64:
    * order-sensitive unlike a plain sum, yet overflow-free and exactly
    * expressible in ANSI SQL, so the driver's DuckDB oracle can verify the
    * whole batched-decode path end-to-end), and a fake width/height derived
    * from the checksum. Replace with a real codec for production; the
    * operator contract (binary in, fixed-width feature struct out) is the
    * real part. */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Int, Int) = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) {
      checksum += (bytes(i) & 0xff).toLong * ((i % 64) + 1)
      i += 1
    }
    val w = 16 + (checksum % 1024).toInt
    val h = 16 + ((checksum / 1024) % 1024).toInt
    (bytes.length.toLong, checksum, w, h)
  }

  /** STUB resize: rescale the fake (width, height) features to fit a
    * bounding box, preserving aspect ratio — the real part is the operator
    * contract (feature struct in → feature struct out, pure projection, no
    * shuffle); swap the arithmetic for a real resampler. */
  def resizeStub(features: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    features
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame sampling over an opaque video payload: treat the byte stream as
    * fixed-width frames, emit every `stride`-th frame offset. The decode is
    * stubbed to arithmetic over `n_bytes` (deterministic, oracle-checkable);
    * the Spark shape — explode to (id, frame_idx, byte_offset) rows, narrow,
    * shuffle-free — is exactly what a real demuxer behind `mapPartitions`
    * would feed downstream. */
  def frameSample(media: DataFrame, idCol: String,
                  frameBytes: Long, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val nFrames = (col("meta.n_bytes") / frameBytes).cast("long")
    media.select(col(idCol), nFrames.as("n_frames"))
      .where(col("n_frames") > 0)
      .select(col(idCol), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * frameBytes)
  }

  /** Batched feature extraction over the binary column via `mapPartitions` —
    * the Scala analog of a Pandas-batched UDF: one iterator per partition, so
    * a real decoder can amortize model/codec init across the whole batch.
    * Partition sizing (`spark.sql.files.maxPartitionBytes`) controls batch
    * memory; binary payloads never pass through a shuffle.
    *
    * Recognized image payloads ([[decodeImage]]) report their real format
    * and pixel dimensions; anything else keeps a null format with
    * [[decodeStub]]'s checksum-derived pseudo-dimensions, so the operator
    * is total over mixed/corrupt corpora. The checksum fingerprint is
    * computed for every payload either way. */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("checksum", LongType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.select(col(idCol).cast(LongType).as("id"), col("content"))
      .mapPartitions { it =>
        // per-partition init point for a real codec/model goes here;
        // null payloads (normal for opaque blob columns) are skipped
        it.flatMap { r =>
          Option(r.getAs[Array[Byte]]("content")).map { bytes =>
            val (n, cks, sw, sh) = decodeStub(bytes)
            decodeImage(bytes) match {
              case Some((fmt, w, h)) => Row(r.getLong(0), n, cks, fmt, w, h)
              case None => Row(r.getLong(0), n, cks, null, sw, sh)
            }
          }
        }
      }
  }

  /** ViT patch-grid planning over decoded image dimensions: one row per
    * `p × p` patch of the ceil(w/p) × ceil(h/p) cover — the image
    * tokenization step a vision-language pipeline runs after decode.
    * Edge patches carry their clipped extent (pw/ph < p at the borders).
    * Pure integer column math + one explode; the explosion factor is the
    * per-image patch count (a model constant), everything codegen'd. */
  def patchify(meta: DataFrame, idCol: String, wCol: String, hCol: String,
               p: Int): DataFrame = {
    require(p >= 1, s"patch size must be >= 1, got $p")
    def ceilDiv(c: org.apache.spark.sql.Column) =
      floor((c + lit(p - 1)) / lit(p)).cast("long")
    val nx = ceilDiv(col(wCol))
    val ny = ceilDiv(col(hCol))
    meta.withColumn("_nx", nx)
      .withColumn("patch_id", explode(sequence(lit(0L), nx * ny - 1)))
      .withColumn("x0", (col("patch_id") % col("_nx")) * p)
      .withColumn("y0",
        floor(col("patch_id") / col("_nx")).cast("long") * p)
      .withColumn("pw", least(lit(p.toLong), col(wCol) - col("x0")))
      .withColumn("ph", least(lit(p.toLong), col(hCol) - col("y0")))
      .drop("_nx")
  }

  /** CLIP-style contrastive pair construction: each (item, caption)
    * positive plus `negatives` deterministic hard-ish negatives drawn from
    * the caption pool by hash — `neg_id = md5(item_id ‖ j ‖ seed) mod
    * pool`, re-drawn at `j+pool` when it lands on the item's own caption
    * (never a false negative). Reproducible across runs, cluster sizes,
    * and epochs (seed change = fresh negative draw — the property a
    * training loop needs; `rand()` gives none of it). Caption ids must be
    * the DENSE range [minId, minId+pool) — the contract a curated caption
    * table provides; loud otherwise. Plan: the negative references join
    * the caption pool on its id (hash join on the pool's key; the item
    * table fans out ×(1+negatives) map-side, no other shuffle). */
  def contrastivePairs(items: DataFrame, captions: DataFrame, idCol: String,
                       captionCol: String, negatives: Int = 3,
                       seed: Long = 0L): DataFrame = {
    require(negatives >= 1, s"negatives must be >= 1, got $negatives")
    val stats = captions.agg(min(col(idCol)).cast("long").as("lo"),
      max(col(idCol)).cast("long").as("hi"),
      count(lit(1)).as("n")).head()
    val (lo, hi, n) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    require(n >= 2, "contrastivePairs needs at least 2 captions")
    require(hi - lo + 1 == n,
      s"caption ids must be dense [$lo, ${lo + n - 1}]: found $n ids in [$lo, $hi]")
    // offset draw: own_index + 1 + (hash mod pool−1), mod pool — lands on
    // every caption EXCEPT the item's own (never a false negative, no
    // rejection loop)
    def draw(j: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        j.cast("string"), lit(":"), lit(seed.toString)).cast("binary")),
        1, 8), 16, 10).cast("long")
      lit(lo) + pmod(col(idCol).cast("long") - lit(lo) + 1L + pmod(h, lit(n - 1)),
        lit(n))
    }
    val refs = items.withColumn("pair_j",
        explode(sequence(lit(0), lit(negatives))))
      .withColumn("is_positive", col("pair_j") === 0)
      .withColumn("cap_ref", when(col("is_positive"), col(idCol))
        .otherwise(draw(col("pair_j"))))
    refs.join(captions.select(col(idCol).as("cap_ref"),
        col(captionCol).as("caption")), Seq("cap_ref"))
      .drop("cap_ref")
  }
}
