package graft

/** Time-segmentation granularity for the document store.
  *
  * Mirrors the reference's segment modes (reference:
  * src/main/java/com/genesyslab/webme/commons/index/config/IndexConfig.java:310-318
  * — OFF/HOUR/DAY/MONTH/YEAR/CUSTOM; segment naming
  * DefaultIndexManager.java:105-151). In the Spark rebuild a "segment" is a
  * partition value of the doc table, so rolling (DefaultIndexManager.java:153-163)
  * is free: new data lands in a new partition directory.
  */
sealed trait SegmentGranularity { def truncUnit: Option[String] }
object SegmentGranularity {
  case object Off   extends SegmentGranularity { val truncUnit = None }
  case object Hour  extends SegmentGranularity { val truncUnit = Some("hour") }
  case object Day   extends SegmentGranularity { val truncUnit = Some("day") }
  case object Month extends SegmentGranularity { val truncUnit = Some("month") }
  case object Year  extends SegmentGranularity { val truncUnit = Some("year") }
  /** The reference's CUSTOM mode: fixed-width frames of `segment-size` ms
    * (reference: IndexDropManager.java:92-99 `now/segmentSize`;
    * IndexConfig.java:557 default 86400000). */
  final case class Fixed(sizeMs: Long) extends SegmentGranularity {
    require(sizeMs > 0, "segment-size must be positive")
    val truncUnit: Option[String] = None
  }
}

/** Engine configuration.
  *
  * One flat case class mirroring the reference's 3-layer option system
  * (reference: config/IndexConfig.java:61-144, config/OptionReader.java:90-169);
  * the Spark rebuild has no per-DC/rack layering (cluster topology is Spark's
  * concern), so a plain case class with the reference's defaults suffices.
  */
final case class IndexConfig(
  /** Search read-amplification bound (reference: IndexConfig.java:64-65). */
  maxResults: Int = 10000,
  /** What bare adjacency in Lucene-lite / `query_string` queries means:
    * "AND" (our default — narrower, reproducible) or "OR" (the ES/Lucene
    * query_string default). Declared divergence: a migrating user whose
    * multi-term queries rely on ES's implicit OR sets this (or the
    * per-query `#options:default-operator=or#` / DSL `default_operator`
    * overrides). The reference passes query strings to ES verbatim
    * (ElasticIndex.java:663-665), inheriting Lucene's OR. */
  defaultOperator: String = "AND",
  /** Drop null fields from docs instead of writing JSON null
    * (reference: IndexConfig.java:73-74; EsSecondaryIndex.java:201). */
  discardNulls: Boolean = true,
  /** Create-or-replace writes (the ES `index` action: the new document wins
    * wholesale) instead of field-merging upsert
    * (reference: IndexConfig.java:76-77; ElasticIndex.java:595-601). */
  insertOnly: Boolean = false,
  /** Suppress all deletes so docs outlive source-row TTL for analytics
    * (reference: IndexConfig.java:107-108; EsSecondaryIndex.java:413). */
  analyticMode: Boolean = false,
  /** Seconds added to TTL comparisons at expiry time
    * (reference: IndexConfig.java:128-129; ElasticIndex.java:827). */
  ttlShiftSec: Long = 0L,
  /** Segment granularity (reference: IndexConfig.java:310-318). */
  segment: SegmentGranularity = SegmentGranularity.Off,
  /** String columns whose value is raw JSON to be indexed structurally
    * (reference: IndexConfig.java:102-104 json-serialized-fields). */
  jsonSerializedFields: Set[String] = Set.empty,
  /** String columns flattened to type-safe string arrays
    * (reference: json-flat-serialized-fields, JsonUtils.java:81-116). */
  jsonFlatSerializedFields: Set[String] = Set.empty,
  /** Stamp an IndexationDate field on every doc (reference: ElasticIndex.java:119, 576-578). */
  indexationDate: Boolean = true,
  /** Tolerate malformed JSON in json-serialized fields instead of failing the
    * write (reference: ElasticIndex.java:118, 519-524 skip-bad-json). */
  skipBadJson: Boolean = false,
  /** M13 dummy mode: every sink operation becomes a no-op (the reference
    * falls back to a no-op index when ES is unreachable under force-start,
    * or when `dummy=true`: EsDummyIndex.java:31-113;
    * EsSecondaryIndex.java:144-146, 160-167). Reads are unaffected. */
  dummy: Boolean = false,
  /** S4: ingest-pipeline definition (`{"processors":[...]}` JSON, compiled
    * by [[IngestPipeline]]) applied to update batches before they reach the
    * store. Mirrors the reference's per-type ES ingest pipeline
    * (`pipeline-<type>` option, IndexConfig.java:110-111; registered
    * ElasticIndex.java:403-417). A defined pipeline switches writes to
    * insert semantics, as in the reference ("pipelines can only be used
    * with index or bulk", ElasticIndex.java:595-605, 868). */
  pipeline: Option[String] = None
) {
  /** Reference parity: `usePipeline = isNotBlank(getPipeline(typeName))`
    * (ElasticIndex.java:868). */
  def usePipeline: Boolean = pipeline.exists(_.trim.nonEmpty)
}
