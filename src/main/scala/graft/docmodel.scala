package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Write-path document model: row → indexable document projection.
  *
  * Re-expresses the reference's cell-decode / doc-build pipeline (reference:
  * EsSecondaryIndex.java:191-247 decode; ElasticIndex.java:470-621 doc build;
  * CStarUtils.java:186-313 typed conversion) as pure
  * `DataFrame => DataFrame` projections. Everything here is built from
  * `org.apache.spark.sql.functions` so the whole pipeline stays inside
  * whole-stage codegen and pushes down to the Parquet scan.
  */
object DocModel {

  /** ISO-8601 GMT format used for every indexed timestamp
    * (reference: JsonUtils.java:49 `yyyy-MM-dd'T'HH:mm:ss.SSS'Z'`). */
  val IsoFormat = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  /** Doc-id synthesis (W4): `_id` = partition-key values then clustering-key
    * values joined with `sep` — configurable like the reference's
    * `genesys-es-id-separator` system property, default `-`; a single bare
    * PK stays un-joined, which `concat_ws` over one column already
    * satisfies. (reference: CStarUtils.java:376-406 toEsId; separator
    * IndexConfig.java:42).
    *
    * 100 TB note: the id is derived, never shuffled for — downstream grouping
    * shuffles on this column directly and Catalyst keeps the expression inline.
    */
  def docId(pkCols: Seq[String], ckCols: Seq[String] = Nil,
            sep: String = "-"): Column =
    // null keys render explicitly — concat_ws SKIPS null components, which
    // would collide ("a",null,"c") with ("a","c",null) and let last-write-
    // wins silently drop rows (Cassandra forbids null PKs; arbitrary
    // DataFrames don't)
    concat_ws(sep, (pkCols ++ ckCols)
      .map(c => coalesce(col(c).cast(StringType), lit("\\N"))): _*)

  /** W9: IndexationDate stamp, ISO-8601 GMT (reference: ElasticIndex.java:576-578).
    * `now` is a parameter (not `current_timestamp()`) so results are
    * deterministic and oracle-comparable. */
  def indexationDate(now: java.sql.Timestamp): Column =
    date_format(lit(now), IsoFormat)

  /** W10: `_cassandraTtl` — epoch-seconds expiration carried on each doc
    * (reference: ElasticIndex.java:580-582; value from EsSecondaryIndex.java:237). */
  def ttlEpoch(expirationCol: Column): Column = expirationCol.cast(LongType)

  /** §1.3 typed conversion: one source column → its indexed representation.
    * The reference stringifies per runtime `AbstractType`
    * (CStarUtils.java:186-313); here Catalyst keeps native types where the doc
    * store supports them and only converts where the reference's semantics
    * demand it (timestamps → ISO strings, blobs → size placeholder,
    * UDT/tuple/collections → JSON).
    */
  def convert(name: String, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType =>
      // reference: CStarUtils.java:202-204 + JsonUtils.java:121-126
      date_format(col(name), IsoFormat)
    case BinaryType =>
      // blob is not indexed; placeholder string (reference: CStarUtils.java:305-306)
      concat(length(col(name)).cast(StringType), lit(" bytes"))
    case _: StructType => to_json(col(name)) // UDT/tuple → JSON (CStarUtils.java:258-288)
    case _: MapType    => to_json(col(name)) // map → JSON object (ElasticIndex.java:552-557)
    case _: ArrayType  => to_json(col(name)) // set/list → JSON array (ElasticIndex.java:560-567)
    case _ => col(name)
  }

  /** W1/W5/W6/W9/W10: full doc projection for a table.
    *
    * Produces `doc_id`, each non-excluded source column converted per §1.3,
    * plus `IndexationDate` and `_cassandraTtl` when configured. One narrow
    * projection — no shuffle; the upsert/groupBy happens later in
    * [[Indexer.upsert]] only when deduplication is actually needed.
    */
  def project(df: DataFrame, pkCols: Seq[String], ckCols: Seq[String],
              cfg: IndexConfig, now: java.sql.Timestamp,
              ttlCol: Option[String] = None): DataFrame = {
    import graft.functions.functions.json_flatten
    val fields = df.schema.fields
      .filterNot(f => ttlCol.contains(f.name) || f.name == "doc_id")
      .map { f =>
        val c =
          if (f.name == "segment") col(f.name) // engine metadata, not a cell
          else if (cfg.jsonFlatSerializedFields.contains(f.name))
            // W8: store the type-safe flattened form (JsonUtils.java:81-116)
            json_flatten(col(f.name))
          else if (cfg.jsonSerializedFields.contains(f.name)) {
            // W7: raw JSON object field. Malformed JSON fails the write
            // unless skip-bad-json (ElasticIndex.java:512-524): strict mode
            // raises at execution, skip mode nulls the field.
            val valid = json_flatten(col(f.name)).isNotNull
            if (cfg.skipBadJson) when(valid, col(f.name))
            else when(col(f.name).isNull || valid, col(f.name))
              .otherwise(raise_error(concat(
                lit(s"malformed JSON in field ${f.name}: "), col(f.name))))
          } else convert(f.name, f.dataType)
        c.as(f.name)
      }.toSeq
    // one select: engine columns derive from pre-projection attributes
    val engineCols =
      (if (cfg.indexationDate) Seq(indexationDate(now).as("IndexationDate")) else Nil) ++
        ttlCol.map(c => ttlEpoch(col(c)).as("_cassandraTtl")).toSeq
    df.select(docId(pkCols, ckCols).as("doc_id") +: (fields ++ engineCols): _*)
  }

  /** ES-side mapping type for a Spark type, per the reference's
    * recommendations (reference: README.md:606-632; SURVEY.md §1.3). */
  def esType(dt: DataType): String = dt match {
    case StringType => "text"
    case TimestampType | TimestampNTZType | DateType => "date"
    case DoubleType | FloatType | _: DecimalType => "double"
    case LongType | IntegerType | ShortType | ByteType => "long"
    case BooleanType => "boolean"
    case BinaryType => "disabled" // blobs are not indexed (CStarUtils.java:305-306)
    case _: StructType | _: MapType => "object"
    case ArrayType(et, _) => esType(et) // set/list map to element type
    case _ => "keyword"
  }

  /** W3: empty-update skip — a doc with no live field left produces no write
    * at all (and no delete!). (reference: EsSecondaryIndex.java:225-227;
    * test EsSecondaryIndexTest.java:152-160). */
  def skipEmpty(df: DataFrame, docCols: Seq[String]): DataFrame = {
    require(docCols.nonEmpty, "skipEmpty needs at least one doc column")
    df.where(docCols.map(c => col(c).isNotNull).reduce(_ || _))
  }

  /** W2: null handling for serialized docs. `discard-nulls=true` (default)
    * drops null fields from the JSON doc; `false` writes explicit JSON nulls
    * (reference: EsSecondaryIndex.java:201; IndexConfig.java:73-74;
    * ElasticIndex.java:525-527). */
  def docJson(cfg: IndexConfig, cols: Column*): Column =
    to_json(struct(cols: _*),
      Map("ignoreNullFields" -> cfg.discardNulls.toString))
}
