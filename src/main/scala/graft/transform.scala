package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The Elasticsearch `_transform` API analog: continuous entity-centric
  * materialization, re-expressed as batch DataFrame transforms (the
  * reference pipes any index-management call to ES verbatim — reference
  * ElasticIndex.java:663; transforms are the summarize-an-index face of
  * that surface).
  *
  *  - `pivot`: group-by + metric aggregations → one row per entity. In
  *    Spark this IS a hash aggregate with map-side partial combine; a
  *    scheduler re-running it per checkpoint is ES's "continuous" mode.
  *  - `latest`: one most-recent document per unique key — `max_by` over
  *    the sort column, the same single-aggregate shape the indexer's
  *    last-write-wins upsert uses (never a window sort).
  *
  * Declared subset: pivot metric types avg/sum/min/max/value_count/
  * cardinality (exact), one level, flat output columns named by the
  * aggregation name.
  */
object Transform {
  private val mapper = new ObjectMapper()

  /** `{"group_by": {name: {"terms": {"field": f}}, ...},
    *   "aggregations": {name: {"avg": {"field": f}}, ...}}` —
    * the ES pivot body, compiled to one groupBy.agg. */
  def pivot(df: DataFrame, body: String): DataFrame = {
    val root = mapper.readTree(body)
    require(root != null && root.isObject, "pivot body must be a JSON object")
    val unknown = root.fieldNames.asScala.toSet -- Set("group_by", "aggregations", "aggs")
    require(unknown.isEmpty,
      s"unsupported pivot option(s): ${unknown.mkString(", ")}")
    val gb = Option(root.get("group_by")).filter(_.isObject)
      .getOrElse(throw new IllegalArgumentException("pivot needs 'group_by'"))
    require(gb.size > 0, "pivot group_by is empty")
    val keys = gb.fieldNames.asScala.toSeq.map { name =>
      val spec = gb.get(name)
      require(spec.isObject && spec.size == 1,
        s"group_by '$name' must be a single-source object")
      val tpe = spec.fieldNames.asScala.next()
      val b = spec.get(tpe)
      val f = Option(b.get("field")).map(_.asText)
        .getOrElse(throw new IllegalArgumentException(
          s"group_by '$name' needs a 'field'"))
      tpe match {
        case "terms" => col(f).as(name)
        case "histogram" =>
          val iv = Option(b.get("interval")).map(_.asDouble)
            .getOrElse(throw new IllegalArgumentException(
              s"group_by '$name' histogram needs 'interval'"))
          require(iv > 0, s"group_by '$name' interval must be > 0")
          (floor(col(f) / iv) * iv).as(name)
        case "date_histogram" =>
          val iv = Option(b.get("calendar_interval")).map(_.asText)
            .getOrElse(throw new IllegalArgumentException(
              s"group_by '$name' date_histogram needs 'calendar_interval'"))
          date_trunc(iv, Tsx.ltz(col(f))).as(name)
        case other => throw new IllegalArgumentException(
          s"unsupported group_by type '$other' (terms/histogram/date_histogram)")
      }
    }
    val aggsNode = Option(root.get("aggregations")).orElse(Option(root.get("aggs")))
      .filter(_.isObject)
      .getOrElse(throw new IllegalArgumentException("pivot needs 'aggregations'"))
    require(aggsNode.size > 0, "pivot aggregations is empty")
    val aggs = aggsNode.fieldNames.asScala.toSeq.map { name =>
      val spec = aggsNode.get(name)
      require(spec.isObject && spec.size == 1,
        s"aggregation '$name' must be a single-type object")
      val tpe = spec.fieldNames.asScala.next()
      val f = Option(spec.get(tpe).get("field")).map(_.asText)
        .getOrElse(throw new IllegalArgumentException(
          s"aggregation '$name' needs a 'field'"))
      (tpe match {
        case "avg" => avg(col(f))
        case "sum" => sum(col(f))
        case "min" => min(col(f))
        case "max" => max(col(f))
        case "value_count" => count(col(f))
        case "cardinality" => count_distinct(col(f)) // exact — superset contract
        case other => throw new IllegalArgumentException(
          s"unsupported pivot aggregation '$other'")
      }).as(name)
    }
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** `{"unique_key": ["k", ...], "sort": "ts"}` — the ES latest body:
    * one most-recent row per key tuple, ties broken by the whole-row
    * struct (deterministic; ES leaves ties to doc order). */
  def latest(df: DataFrame, body: String): DataFrame = {
    val root = mapper.readTree(body)
    require(root != null && root.isObject, "latest body must be a JSON object")
    val unknown = root.fieldNames.asScala.toSet -- Set("unique_key", "sort")
    require(unknown.isEmpty,
      s"unsupported latest option(s): ${unknown.mkString(", ")}")
    val keys = Option(root.get("unique_key")).filter(_.isArray)
      .map(_.elements.asScala.toSeq.map(_.asText))
      .getOrElse(throw new IllegalArgumentException(
        "latest needs 'unique_key': [..]"))
    require(keys.nonEmpty, "latest unique_key is empty")
    val sort = Option(root.get("sort")).map(_.asText)
      .getOrElse(throw new IllegalArgumentException("latest needs 'sort'"))
    val payload = struct(df.columns.map(col).toSeq: _*)
    val version = struct(col(sort) +: df.columns.map(col).toSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, version).as("_doc"))
      .select(df.columns.toSeq.map(c => col(s"_doc.$c")): _*)
  }
}
