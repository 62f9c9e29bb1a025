package graft.streaming

import graft.{IndexConfig, Indexer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** S1: real-time indexing as Structured Streaming.
  *
  * The reference receives one callback per Cassandra mutation
  * (reference: EsSecondaryIndex.java:390-414, indexers/EsIndexer.java:58-70)
  * and upserts the doc per row. The Spark rebuild treats the mutation stream
  * as a streaming DataFrame: each micro-batch runs the *same* batch upsert
  * pipeline via `foreachBatch` — exactly-once per batch replaces the
  * reference's per-key locks and commit-log-replay skips (W11/W12).
  */
object StreamingIndexer {

  /** Continuous upsert into a keyed in-memory/delta-style state: each
    * micro-batch is reduced to last-write-wins per key and handed to `sink`
    * (e.g. a MERGE/overwrite writer). */
  def upsertStream(mutations: DataFrame, keyCol: String, versionCols: Seq[String],
                   sink: (DataFrame, Long) => Unit,
                   trigger: Trigger = Trigger.ProcessingTime(0L)): DataStreamWriter[Row] =
    mutations.writeStream
      .outputMode(OutputMode.Update())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Indexer.latestPerKey(batch, keyCol, versionCols), id)
      }

  /** Continuous inverted-index maintenance: like [[upsertStream]], but each
    * micro-batch ALSO appends its own postings to the text index before the
    * doc sink runs — the search path stays index-served while mutations
    * stream in. Appending (never rewriting) per batch is correct because
    * the index contract is candidates-plus-verification: stale postings for
    * overwritten docs are false candidates the verifier drops
    * ([[graft.TextIndex]] class doc); only a MISSING posting could lose a
    * hit, and the append in the same `foreachBatch` prevents exactly that.
    * Run [[graft.TextIndex.compactPostings]] on a maintenance cadence for
    * size, like Lucene's background merges. */
  def upsertStreamIndexed(mutations: DataFrame, keyCol: String,
                          versionCols: Seq[String], fields: Seq[String],
                          postingsPath: String, nBuckets: Int,
                          sink: (DataFrame, Long) => Unit,
                          trigger: Trigger = Trigger.ProcessingTime(0L)): DataStreamWriter[Row] =
    mutations.writeStream
      .outputMode(OutputMode.Update())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val docs = Indexer.latestPerKey(batch, keyCol, versionCols)
        graft.TextIndex.appendPostings(docs, keyCol, fields, postingsPath, nBuckets)
        sink(docs, id)
      }

  /** [[upsertStreamIndexed]] for INSERT-ONLY streams, maintaining the
    * full serving surface: each micro-batch appends its postings AND its
    * norms rows (so index-served BM25 stays current — norms are per-doc
    * facts, exact under insert-only batches), and optionally the phrase-
    * suggester LM delta. CONTRACT: every key is globally NEW — an
    * in-place edit would leave duplicate norms rows (skewing BM25 length
    * normalization) and stale LM counts; deduplicate replays upstream
    * with [[exactlyOnceStream]] and repair edits with
    * [[graft.TextIndex.reindexSegment]]-style rebuilds, per the append
    * contracts on [[graft.TextIndex.appendNorms]] /
    * [[graft.Search.appendSuggestStore]]. StreamingSpec pins that BM25
    * served from the streamed stores equals an all-at-once batch build. */
  def insertStreamServed(mutations: DataFrame, keyCol: String,
                         versionCols: Seq[String], fields: Seq[String],
                         postingsPath: String, normsPath: String,
                         nBuckets: Int, suggestPath: Option[String] = None,
                         suggestField: Option[String] = None,
                         sink: (DataFrame, Long) => Unit = (_, _) => (),
                         trigger: Trigger = Trigger.ProcessingTime(0L)): DataStreamWriter[Row] =
    mutations.writeStream
      .outputMode(OutputMode.Update())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val docs = Indexer.latestPerKey(batch, keyCol, versionCols)
        graft.TextIndex.appendPostings(docs, keyCol, fields, postingsPath, nBuckets)
        graft.TextIndex.appendNorms(docs, keyCol, fields, normsPath)
        suggestPath.foreach(p => graft.Search.appendSuggestStore(docs,
          suggestField.getOrElse(fields.head), p))
        sink(docs, id)
      }

  /** W12 streaming: exactly-once ingest with BOUNDED state. The batch twin
    * ([[Indexer.exactlyOnce]]) and a plain streaming `dropDuplicates`
    * remember every (key, mutation id) forever — at 100 TB/day the state
    * store itself becomes the scale problem. `dropDuplicatesWithinWatermark`
    * keeps a key only until the watermark passes it: duplicate deliveries
    * (retries, replays) arrive within the delivery-delay bound by
    * definition, so expiring state beyond the watermark loses nothing.
    * State is bounded by the duplicate-arrival window, not stream history. */
  def exactlyOnceStream(mutations: DataFrame, keyCol: String, mutationIdCol: String,
                        tsCol: String, watermark: String): DataFrame =
    mutations.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol, mutationIdCol)

  /** Event-time windowed rollup with a watermark — the streaming analog of
    * segment-bucketed counts (M2/M3); late data beyond the watermark is
    * dropped deterministically instead of the reference's wall-clock TTL. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     valueCol: Option[String] = None,
                     window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      valueCol.map(v => sum(col(v)).as("total")).toSeq
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
  }
}
