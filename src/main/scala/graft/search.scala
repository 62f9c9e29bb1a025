package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Read-path search executor (R4-R10).
  *
  * Reference lifecycle (SURVEY.md §3.1): query string → ES search → ordered
  * hits → PK reconstruction → per-row Cassandra loads → metadata enrichment.
  * Spark shape: `docs.where(pred).withColumn(score).orderBy(...).limit(k)`
  * then an (optionally broadcast) join back to the base table. The per-hit
  * point-read fan-out (reference: StreamingPartitionIterator.java:102-178)
  * becomes one join whose strategy Catalyst/AQE picks — broadcast when the
  * hit list is small, shuffled hash otherwise; at 100 TB a capped top-k hit
  * list (max-results, default 10k) is always broadcastable.
  */
object Search {

  /** Execute a compiled query over the doc table: filter, score, order by
    * relevance with a deterministic `doc_id` tiebreak (ES order is opaque;
    * ours must be reproducible), cap at max-results
    * (reference: ElasticIndex.java:658-722; cap IndexConfig.java:64-65). */
  def topK(docs: DataFrame, q: CompiledQuery, cfg: IndexConfig,
           tiebreak: String = "doc_id"): DataFrame = {
    val limit = q.limit.getOrElse(cfg.maxResults).min(cfg.maxResults)
    docs.where(q.predicate)
      .withColumn("_score", q.score)
      .orderBy(desc("_score"), col(tiebreak))
      .limit(limit)
  }

  /** One-call search: parse + compile + execute.
    * `#options:load-rows=false#` (R1/S8) short-circuits to a PK-only
    * projection — no join, no row load
    * (reference: QueryMetaData.java:64-67; FakePartitionIterator.java:91-119). */
  def search(docs: DataFrame, query: String, cfg: IndexConfig,
             pkCols: Seq[String] = Seq("doc_id")): DataFrame = {
    val meta = QueryMeta.parse(query)
    val compiled = QueryCompiler.compile(meta.query, cfg.maxResults)
    val hits = topK(docs, compiled, cfg, pkCols.head)
    if (meta.loadRows) hits
    else hits.select((pkCols.map(col) :+ col("_score")): _*)
  }

  /** R9: load full source rows for the surviving hits. Inner join naturally
    * drops rows that vanished from the base table (expired/deleted — the
    * reference skips those too, README.md:693-697). The hit side is capped at
    * max-results, so broadcast it — one scan of the base table, no shuffle
    * (reference does N point-reads instead: StreamingPartitionIterator.java:113-126). */
  def loadRows(hits: DataFrame, base: DataFrame, pkCols: Seq[String]): DataFrame = {
    val hitKeys = hits.select((pkCols.map(col) :+ col("_score")): _*)
    base.join(broadcast(hitKeys), pkCols, "inner")
  }

  /** R10: metadata enrichment — attach global search stats (total hit count,
    * max score) to every result row, the analog of ES `hits.total`/`max_score`
    * injected into the dummy column (reference: ElasticIndex.java:719-721;
    * StreamingPartitionIterator.java:146-174). Uses an unpartitioned window
    * over the already-capped hit list (≤ max-results rows), not the raw data. */
  def withMeta(hits: DataFrame): DataFrame = {
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hits.withColumn("hit_count", count(lit(1)).over(w))
        .withColumn("max_score", max(col("_score")).over(w))
  }
}
