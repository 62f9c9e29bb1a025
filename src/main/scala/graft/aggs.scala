package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** ES-DSL aggregations compiled to Spark aggregate plans.
  *
  * The reference has no aggregation engine of its own (SURVEY §2.5): ES
  * computes `hits.total`/`max_score`, and users run real aggregations
  * against the backing Elasticsearch alias directly — the reference even
  * leaves its index type un-enforced to allow "cross-table aggregations"
  * (reference README.md:680-683). This module is that user surface,
  * re-expressed Spark-first: the search body's `query` compiles to the
  * same predicate the search executor uses ([[QueryCompiler]]), and each
  * entry under `aggs`/`aggregations` becomes one `groupBy` plan — hash
  * aggregates with map-side partial combine, the 100 TB shape (one shuffle
  * of group keys per agg; never a window, never a collect).
  *
  * Supported subset (declared):
  *  - bucket aggs: `terms` (size, default 10; ES default order `_count`
  *    desc then key asc), `date_histogram` (`calendar_interval`: year /
  *    month / week / day / hour / minute), `histogram` (fixed `interval`),
  *    `range` (`from` inclusive, `to` exclusive, ES label format
  *    `from-to` with `*` for open ends). Buckets drop null keys and — like
  *    ES histograms — empty buckets are absent (no `min_doc_count: 0`
  *    zero-fill).
  *  - metric aggs: `avg`, `sum`, `min`, `max`, `value_count`,
  *    `cardinality`, `stats`. `stats` flattens to
  *    `<name>_count/_min/_max/_avg/_sum` columns. DECLARED DIVERGENCE:
  *    `cardinality` is EXACT count-distinct where ES answers with
  *    approximate HyperLogLog++ — exactness is a superset contract, and
  *    Spark's hash aggregate pays the same one shuffle either way.
  *  - one level of metric sub-aggs under a bucket agg (`"aggs"` inside a
  *    bucket body — the dominant real-world shape, `terms` + `avg`).
  *
  * Output schema per agg: bucket key as `key` (+ `doc_count`), one column
  * per metric sub-agg named by its agg name — flat columns, not ES's
  * response JSON; a DataFrame IS the bucket list.
  */
object Aggs {
  private val mapper = new ObjectMapper()

  /** Run every aggregation in an ES search body over `docs`, filtered by
    * the body's `query` (absent → match_all). Returns one DataFrame per
    * top-level aggregation name. */
  def run(docs: DataFrame, body: String, idCol: String = "doc_id"): Map[String, DataFrame] = {
    val root = mapper.readTree(body)
    require(root != null && root.isObject, "search body must be a JSON object")
    val aggsNode = Option(root.get("aggs")).orElse(Option(root.get("aggregations")))
      .getOrElse(throw new IllegalArgumentException("missing 'aggs'/'aggregations'"))
    require(aggsNode.isObject && aggsNode.size > 0, "'aggs' must be a non-empty object")
    val filtered =
      if (root.has("query"))
        docs.where(QueryCompiler.compile(body, Int.MaxValue, idCol).predicate)
      else docs
    aggsNode.fieldNames.asScala.map { name =>
      name -> one(filtered, name, aggsNode.get(name))
    }.toMap
  }

  /** Single-agg convenience: the body must contain exactly one top-level
    * aggregation (plus an optional `query`). */
  def runSingle(docs: DataFrame, body: String, idCol: String = "doc_id"): DataFrame = {
    val m = run(docs, body, idCol)
    require(m.size == 1, s"expected exactly one aggregation, got ${m.keys.mkString(", ")}")
    m.head._2
  }

  private def one(docs: DataFrame, name: String, spec: JsonNode): DataFrame = {
    require(spec.isObject, s"aggregation '$name' must be an object")
    val subAggs = Option(spec.get("aggs")).orElse(Option(spec.get("aggregations")))
    val types = spec.fieldNames.asScala.filterNot(f => f == "aggs" || f == "aggregations").toList
    require(types.size == 1, s"aggregation '$name' must have exactly one type, got: $types")
    val (tpe, body) = (types.head, spec.get(types.head))

    def fieldOf(n: JsonNode): String = {
      val f = Option(n.get("field")).map(_.asText)
        .getOrElse(throw new IllegalArgumentException(s"'$tpe' in '$name' needs a 'field'"))
      require(f.nonEmpty, s"'$tpe' in '$name' has an empty 'field'")
      f
    }

    tpe match {
      // ---- bucket aggs: groupBy on a derived key + doc_count + sub-metrics
      case "terms" =>
        val f = fieldOf(body)
        val size = Option(body.get("size")).map(_.asInt).getOrElse(10)
        bucketed(docs, col(f), subAggs, name)
          .orderBy(desc("doc_count"), asc("key"))
          .limit(size)
      case "date_histogram" =>
        val f = fieldOf(body)
        val interval = Option(body.get("calendar_interval"))
          .orElse(Option(body.get("interval"))).map(_.asText)
          .getOrElse(throw new IllegalArgumentException(
            s"date_histogram '$name' needs 'calendar_interval'"))
        val allowed = Set("year", "quarter", "month", "week", "day", "hour", "minute")
        require(allowed.contains(interval),
          s"unsupported calendar_interval '$interval' (allowed: ${allowed.mkString(", ")})")
        bucketed(docs, date_trunc(interval.toUpperCase, col(f)), subAggs, name)
          .orderBy(asc("key"))
      case "histogram" =>
        val f = fieldOf(body)
        val interval = Option(body.get("interval")).map(_.asDouble)
          .getOrElse(throw new IllegalArgumentException(s"histogram '$name' needs 'interval'"))
        require(interval > 0, s"histogram '$name' interval must be > 0")
        bucketed(docs, floor(col(f) / interval) * interval, subAggs, name)
          .orderBy(asc("key"))
      case "range" =>
        val f = fieldOf(body)
        val ranges = Option(body.get("ranges")).filter(_.isArray)
          .getOrElse(throw new IllegalArgumentException(s"range '$name' needs 'ranges'"))
          .elements.asScala.toSeq
        require(ranges.nonEmpty, s"range '$name' has no ranges")
        // ES label: "from-to" with * for an open end; from inclusive, to exclusive
        val key = ranges.foldLeft(lit(null).cast("string")) { (acc, r) =>
          val from = Option(r.get("from")).map(_.asDouble)
          val to = Option(r.get("to")).map(_.asDouble)
          require(from.isDefined || to.isDefined, s"range '$name' bucket needs from or to")
          val label = Option(r.get("key")).map(_.asText).getOrElse(
            s"${from.map(_.toString).getOrElse("*")}-${to.map(_.toString).getOrElse("*")}")
          val in = (from.map(col(f) >= _), to.map(col(f) < _)) match {
            case (Some(a), Some(b)) => a && b
            case (Some(a), None) => a
            case (None, Some(b)) => b
            case _ => lit(true)
          }
          // first matching range wins for overlaps (ES puts a doc in every
          // matching range; one-bucket-per-doc keeps doc_count additive —
          // declared divergence, overlapping ranges are rare and explicit)
          when(acc.isNotNull, acc).otherwise(when(in, lit(label)))
        }
        bucketed(docs, key, subAggs, name).orderBy(asc("key"))

      // ---- top-level metric aggs: one global aggregate row
      case _ =>
        val ms = metric(tpe, name, body)
        docs.agg(ms.head, ms.tail: _*)
    }
  }

  /** groupBy the bucket key, count, and append metric sub-aggs. */
  private def bucketed(docs: DataFrame, key: Column, subAggs: Option[JsonNode],
                       parent: String): DataFrame = {
    val metrics = subAggs.toSeq.flatMap { n =>
      require(n.isObject, s"sub-aggs of '$parent' must be an object")
      n.fieldNames.asScala.toSeq.flatMap { sub =>
        val subSpec = n.get(sub)
        val ts = subSpec.fieldNames.asScala.toList
        val bucketTypes = Set("terms", "date_histogram", "histogram", "range")
        require(ts.size == 1 && !ts.exists(t =>
          t == "aggs" || t == "aggregations" || bucketTypes.contains(t)),
          s"sub-agg '$sub' of '$parent' must be a single metric (no nested buckets)")
        metric(ts.head, sub, subSpec.get(ts.head))
      }
    }
    val aggCols = (count(lit(1)).as("doc_count") +: metrics)
    docs.where(key.isNotNull).groupBy(key.as("key"))
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** A metric agg as aggregate column(s) named by the agg name. */
  private def metric(tpe: String, name: String, body: JsonNode): Seq[Column] = {
    val f = Option(body.get("field")).map(_.asText)
      .getOrElse(throw new IllegalArgumentException(s"metric '$name' needs a 'field'"))
    tpe match {
      case "avg" => Seq(avg(col(f)).as(name))
      case "sum" => Seq(sum(col(f)).as(name))
      case "min" => Seq(min(col(f)).as(name))
      case "max" => Seq(max(col(f)).as(name))
      case "value_count" => Seq(count(col(f)).as(name))
      case "cardinality" => Seq(count_distinct(col(f)).as(name)) // exact (ES: approx HLL)
      case "stats" => Seq(
        count(col(f)).as(s"${name}_count"), min(col(f)).as(s"${name}_min"),
        max(col(f)).as(s"${name}_max"), avg(col(f)).as(s"${name}_avg"),
        sum(col(f)).as(s"${name}_sum"))
      case other => throw new IllegalArgumentException(s"unsupported aggregation type '$other'")
    }
  }
}
