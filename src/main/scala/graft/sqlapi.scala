package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** The Elasticsearch `_sql` endpoint analog (reference surface: the
  * verbatim request pipe, reference ElasticIndex.java:663 — clients run
  * SQL against the backing alias the same way they run DSL).
  *
  * ES SQL exposes indices as tables and runs ANSI-ish SQL with an optional
  * ES-DSL `filter` that is ANDed under every table reference, paged by
  * `fetch_size`. Re-expressed Spark-first, the engine IS a SQL engine: each
  * index registers as a temp view and the query goes through Catalyst
  * whole — predicate pushdown, column pruning, join planning all come from
  * the optimizer, not from this wrapper. The DSL `filter` compiles through
  * [[QueryCompiler]] (the same predicate the search executor uses) and is
  * applied to every registered index BEFORE the SQL sees it, exactly ES's
  * filter-parameter contract.
  *
  * Declared subset: one response page (`fetch_size` = LIMIT; cursor
  * continuation is [[Scroll]]'s job), Spark SQL dialect (a superset of the
  * ES SQL grammar for everything the reference's clients emit).
  */
object EsSql {
  private val mapper = new ObjectMapper()

  /** Run a `_sql` body — `{"query": "...", "fetch_size"?: N,
    * "filter"?: {DSL}}` — against the index catalog. */
  def run(spark: SparkSession, catalog: Map[String, DataFrame],
          body: String): DataFrame = {
    val root = mapper.readTree(body)
    require(root != null && root.isObject, "_sql body must be a JSON object")
    val unknown = root.fieldNames.asScala.toSet --
      Set("query", "fetch_size", "filter")
    require(unknown.isEmpty,
      s"unsupported _sql option(s): ${unknown.mkString(", ")}")
    val sql = Option(root.get("query")).filter(_.isTextual).map(_.asText)
      .getOrElse(throw new IllegalArgumentException("_sql needs 'query'"))
    require(sql.trim.nonEmpty, "_sql 'query' is empty")
    val fetch = Option(root.get("fetch_size")).map { n =>
      require(n.isIntegralNumber && n.asInt > 0,
        s"_sql fetch_size must be a positive integer, got: $n")
      n.asInt
    }
    val filtered = Option(root.get("filter")) match {
      case Some(f) =>
        val pred = QueryCompiler
          .compile(s"""{"query": ${f.toString}}""", Int.MaxValue, "doc_id")
          .predicate
        catalog.view.mapValues(_.where(pred)).toMap
      case None => catalog
    }
    filtered.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    val out = spark.sql(sql)
    fetch.map(out.limit).getOrElse(out)
  }
}
