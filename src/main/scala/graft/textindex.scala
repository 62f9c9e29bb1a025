package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized inverted text index: the scale path for the read side.
  *
  * The reference IS an index — its entire reason to exist is that scanning
  * every Cassandra row per search is unaffordable, so it mirrors rows into
  * Elasticsearch/Lucene postings and serves queries from those
  * (reference: EsSecondaryIndex.java:91; README.md:55-60). The scan-based
  * [[Search]] executor is exact and pushdown-friendly, but it reads the
  * whole doc store per query; at 100 TB a selective term query must touch
  * data proportional to its RESULT, not the corpus. This module is the
  * Spark-native Lucene analog:
  *
  *  - '''Build''': tokenize indexed fields into `(token, field, doc_id)`
  *    postings — one narrow explode+distinct, no joins. The store is
  *    written `partitionBy(bucket)` where `bucket = xxhash64(token) mod N`,
  *    sorted by `(token, field)` inside each partition, so a term lookup
  *    [[prunes]] to one directory of N and its parquet row-group stats are
  *    tight (the `token=` pushed filter skips most pages).
  *  - '''Query''': a Lucene-lite query is answered as *candidate retrieval +
  *    exact re-verification*. The AST is walked for a "cover": a set of
  *    token probes whose postings union is PROVABLY a superset of the
  *    query's matches (see [[cover]]). Candidate doc ids come from the
  *    pruned postings scan; the full compiled predicate then re-runs on the
  *    candidate rows only — results are bit-identical to the scan executor,
  *    the index can only make the query cheaper, never wrong.
  *  - '''Maintenance is append-only.''' Because verification re-applies the
  *    exact predicate against the CURRENT doc store, stale postings (for
  *    overwritten or deleted docs) are harmless false candidates, and only
  *    MISSING postings could hurt recall. So an upsert batch just appends
  *    its own postings ([[appendPostings]]) — no read-modify-write, no
  *    tombstones, the same cheap contract as a Lucene segment append.
  *    [[compactPostings]] (optional, for size) dedups and rewrites like the
  *    doc store's small-file compaction.
  *
  * Tokenization matches [[QueryCompiler.termMatch]]'s declared semantics
  * exactly: `termMatch` anchors on Java regex `\b` word boundaries, so a
  * term made of word chars (`[a-z0-9_]+` after lowercasing) matches a
  * document iff it equals a MAXIMAL word-char run of the lowered text.
  * Those maximal runs are precisely the tokens this index stores — the
  * equality-probe cover is exact, not just a superset, for such terms.
  * A trailing-`*` wildcard (`filt*`) compiles to `\bfilt[^\s]*`: any match
  * site starts a maximal word run beginning with `filt`, so a
  * `startsWith(token)` probe over-approximates it correctly. Every other
  * leaf shape (fuzzy, regex, ranges, phrases, inner wildcards, non-word
  * chars, unindexed fields) is declared non-coverable and the query falls
  * back to the scan executor — transparently, same results.
  */
object TextIndex {

  /** Maximal-word-run tokenizer, the `\b`-boundary view of the text (see
    * class doc). Split on non-word runs; `split` emits empty edge strings,
    * filtered after the explode. */
  private def tokensOf(c: org.apache.spark.sql.Column) =
    split(lower(c.cast("string")), "[^a-z0-9_]+")

  /** One probe the postings store can answer with a pushed-down filter. */
  private[graft] sealed trait Probe
  private[graft] final case class EqProbe(field: String, token: String) extends Probe
  private[graft] final case class PrefixProbe(field: String, prefix: String) extends Probe

  private val WordTerm = "^[a-z0-9_]+$".r
  private val PrefixTerm = "^([a-z0-9_]+)\\*$".r

  /** Build postings for `fields` of `docs`: `(token, field, doc_id, bucket)`,
    * distinct. Distinct is a hash aggregate — duplicate tokens within a doc
    * combine map-side before the one exchange on the grouping key; nothing
    * wider than the 3-column posting ever shuffles. */
  def buildPostings(docs: DataFrame, idCol: String, fields: Seq[String],
                    nBuckets: Int = 64): DataFrame = {
    require(fields.nonEmpty, "index at least one field")
    require(nBuckets > 0, "nBuckets must be positive")
    val perField = fields.map { f =>
      docs.select(explode(tokensOf(col(f))).as("token"),
        lit(f).as("field"), col(idCol).as("doc_id"))
    }
    perField.reduce(_.unionAll(_))
      .where(col("token") =!= "")
      .distinct()
      .withColumn("bucket", pmod(xxhash64(col("token")), lit(nBuckets)).cast("int"))
  }

  /** Write the postings store: clustered by bucket (one file per partition
    * dir, not tasks×buckets), sorted by `(token, field)` within files so
    * parquet min/max stats make the pushed token filter skip most
    * row groups. */
  def writePostings(postings: DataFrame, path: String): Unit =
    postings.repartition(col("bucket"))
      .sortWithinPartitions("token", "field")
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Append-only incremental maintenance: index an upsert batch's postings
    * into an existing store (see class doc for why append alone preserves
    * correctness). `nBuckets` must match the store's. */
  def appendPostings(newDocs: DataFrame, idCol: String, fields: Seq[String],
                     path: String, nBuckets: Int = 64): Unit =
    buildPostings(newDocs, idCol, fields, nBuckets)
      .repartition(col("bucket"))
      .sortWithinPartitions("token", "field")
      .write.mode("append").partitionBy("bucket").parquet(path)

  /** Optional size reclaim after many appends: global dedup + rewrite,
    * atomic per the same staging-dir pattern as
    * [[Maintain.compactSegments]]. Returns (files before, files after). */
  def compactPostings(spark: SparkSession, path: String): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: Path): Int =
      fs.listStatus(p).toSeq.map { st =>
        if (st.isDirectory) dataFiles(st.getPath)
        else if (!st.getPath.getName.startsWith("_") &&
                 !st.getPath.getName.startsWith(".")) 1 else 0
      }.sum
    val before = dataFiles(root)
    val tmp = new Path(root.getParent, root.getName + ".compact_tmp")
    fs.delete(tmp, true)
    val deduped = spark.read.option("basePath", path).parquet(path).distinct()
    deduped.repartition(col("bucket"))
      .sortWithinPartitions("token", "field")
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp.toString)
    fs.delete(root, true)
    require(fs.rename(tmp, root), s"compaction rename failed: $tmp -> $root")
    (before, dataFiles(root))
  }

  import QueryCompiler.LuceneLite
  import LuceneLite._

  /** A leaf probe if the term is index-answerable (see class doc): a pure
    * word-char term → equality probe (exact), `prefix*` → startsWith probe
    * (superset). Values containing escapes, inner wildcards, `?`, phrases
    * (spaces), or non-word chars are not coverable — their `termMatch`
    * semantics span token boundaries the postings can't see. */
  private def leafProbe(t: Term, fields: Set[String]): Option[Probe] =
    if (!fields.contains(t.field)) None
    else t.value.toLowerCase match {
      case WordTerm() => Some(EqProbe(t.field, t.value.toLowerCase))
      case PrefixTerm(p) => Some(PrefixProbe(t.field, p))
      case _ => None
    }

  /** Cover of the AST: a probe set whose postings union is a superset of
    * the query's matches, or None if no such set exists.
    *
    *  - `AND(l, r)`: matches ⊆ matches(l) and ⊆ matches(r) — either side's
    *    cover suffices; prefer the smaller probe set (fewer postings read).
    *  - `OR(l, r)`: both sides must be covered (union).
    *  - `NOT` and non-term leaves: no cover (a negation's matches are the
    *    corpus complement — no postings subset bounds it).
    *
    * By induction every doc matching the query carries at least one probed
    * token, so retrieval recall is exactly 1 and re-verification restores
    * precision. */
  private[graft] def cover(n: Node, fields: Set[String]): Option[Set[Probe]] = n match {
    case t: Term => leafProbe(t, fields).map(Set(_))
    case And(l, r) =>
      (cover(l, fields), cover(r, fields)) match {
        case (Some(a), Some(b)) => Some(if (b.size < a.size) b else a)
        case (a, b) => a.orElse(b)
      }
    case Or(l, r) =>
      for { a <- cover(l, fields); b <- cover(r, fields) } yield a ++ b
    case _ => None
  }

  /** Can this Lucene-lite query be served from the index (vs falling back
    * to the scan executor)? Malformed queries report false — validation
    * stays [[QueryCompiler.validate]]'s job. */
  def coverable(query: String, indexedFields: Set[String]): Boolean = {
    val q = QueryMeta.parse(query).query.trim
    !q.startsWith("{") &&
      (try cover(LuceneLite.ast(q), indexedFields).isDefined
       catch { case _: Exception => false })
  }

  /** Candidate doc ids for a probe set, as a pushed-down postings scan:
    * equality probes pin their `bucket` partition values (directory-level
    * pruning — a term query reads ~1/N of the store) and their `token`
    * values (row-group skips within the directory); prefix probes push a
    * `StartsWith` range over all buckets (the token hash is unknowable from
    * a prefix — still a stats-pruned scan, never a regex). */
  private[graft] def candidateIds(postings: DataFrame, probes: Set[Probe],
                                  nBuckets: Int): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val eqs = probes.collect { case EqProbe(f, t) => (f, t) }.toSeq.sorted
    val prefixes = probes.collect { case PrefixProbe(f, p) => (f, p) }.toSeq.sorted
    // bucket literals via the same Spark expression as the write path — a
    // driver-side reimplementation of xxhash64 could drift; probe counts are
    // query-sized, so this local job is O(#terms)
    val eqPred = if (eqs.isEmpty) None else {
      val buckets = eqs.toDF("field", "token")
        .select(pmod(xxhash64(col("token")), lit(nBuckets)).cast("int"))
        .distinct().as[Int].collect().toSeq
      Some(col("bucket").isin(buckets: _*) &&
        eqs.map { case (f, t) => col("field") === f && col("token") === t }
          .reduce(_ || _))
    }
    val prePred = if (prefixes.isEmpty) None else
      Some(prefixes.map { case (f, p) =>
        col("field") === f && col("token").startsWith(p)
      }.reduce(_ || _))
    val pred = (eqPred ++ prePred).reduce(_ || _)
    postings.where(pred).select("doc_id")
  }

  /** Restrict `docs` to index candidates for `query` — the pre-filter the
    * scan executor then verifies. Falls back to `docs` unchanged when the
    * query has no cover, so composing with [[Search.search]] is always
    * safe. The semi join's strategy is Catalyst/AQE's choice: a selective
    * term yields a broadcastable candidate list; a stop-word-ish term
    * degrades to a shuffled semi join, never to a wrong answer. */
  def prefilter(docs: DataFrame, postings: DataFrame, query: String,
                idCol: String = "doc_id", indexedFields: Set[String],
                nBuckets: Int = 64): DataFrame = {
    val q = QueryMeta.parse(query).query.trim
    val probes =
      if (q.startsWith("{")) None
      else try cover(LuceneLite.ast(q), indexedFields)
           catch { case _: Exception => None }
    probes match {
      case Some(ps) =>
        val cands = candidateIds(postings, ps, nBuckets)
          .withColumnRenamed("doc_id", "_cand_id")
        docs.join(cands, docs(idCol) === col("_cand_id"), "left_semi")
      case None => docs
    }
  }

  /** Index-served search: identical results to `Search.search(docs, …)` by
    * construction (candidates are a proven superset; the scan executor
    * re-applies the exact compiled predicate, score, order, and cap on
    * them). */
  def searchIndexed(docs: DataFrame, postings: DataFrame, query: String,
                    cfg: IndexConfig, pkCols: Seq[String] = Seq("doc_id"),
                    indexedFields: Set[String], nBuckets: Int = 64): DataFrame =
    Search.search(
      prefilter(docs, postings, query, pkCols.head, indexedFields, nBuckets),
      query, cfg, pkCols)
}
