package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a batched feature-extraction operator.
  *
  * The Spark-side plumbing (schema, partition-friendly batching, operator
  * signature) is real; the actual media decode is STUBBED — this container
  * has no image/audio codecs, so [[decodeStub]] derives deterministic fake
  * features from the raw bytes. Swap `decodeStub` for a real decoder (JNI /
  * external service) without touching the pipeline shape.
  */
object Multimodal {

  /** Canonical multimodal schema fragment: opaque payload + typed metadata. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),      // image | audio | video
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = true)))

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
    * memory; binary payloads never pass through a shuffle. */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("checksum", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.select(col(idCol).cast(LongType).as("id"), col("content"))
      .mapPartitions { it =>
        // per-partition init point for a real codec/model goes here;
        // null payloads (normal for opaque blob columns) are skipped
        it.flatMap { r =>
          Option(r.getAs[Array[Byte]]("content")).map { bytes =>
            val (n, cks, w, h) = decodeStub(bytes)
            Row(r.getLong(0), n, cks, w, h)
          }
        }
      }
  }
}
