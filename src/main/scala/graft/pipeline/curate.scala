package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation for large-scale training-data pipelines (north-star
  * surface; the reference has no curation concept): benchmark
  * decontamination, PII redaction, domain mixing, and sequence packing.
  *
  * Scale discipline: every operator is either a narrow map (PII, packing
  * inside a per-group window) or a broadcast-semi-join whose shuffled
  * payload is ids only (decontamination) — no all-pairs joins, no collects.
  */
object Curate {

  // ------------------------------------------------------------ decontaminate

  /** Training docs sharing at least one word `n`-gram with the benchmark
    * corpus, with the count of distinct shared grams per doc.
    *
    * Scale shape (100 TB train, benchmark is small by definition): the
    * benchmark's distinct grams are broadcast; the train side streams
    * `(id, gram)` through a map-side broadcast join, so the only exchange
    * is the final per-id aggregate — contaminated ids, not text. A 13-gram
    * at GPT-3 scale is the classic setting; `n` is a parameter because the
    * gate corpus' docs are short.
    */
  def contaminationReport(train: DataFrame, bench: DataFrame,
                          textCol: String, idCol: String, n: Int): DataFrame = {
    val benchGrams = bench
      .select(Dedup.tokens(col(textCol)).as("toks"))
      .select(explode(Dedup.shinglesOfTokens(col("toks"), n)).as("gram"))
      .distinct()
    train
      .select(col(idCol), Dedup.tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(Dedup.shinglesOfTokens(col("toks"), n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched_grams"))
  }

  /** Drop every train doc that shares an `n`-gram with the benchmark —
    * left-anti join against the (id-only) contamination report. */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    textCol: String, idCol: String, n: Int): DataFrame =
    train.join(contaminationReport(train, bench, textCol, idCol, n)
                 .select(col(idCol)),
               Seq(idCol), "left_anti")

  /** WHERE the benchmark leaked: maximal token spans of each train doc
    * whose every `n`-window is a benchmark n-gram — [[decontaminate]] at
    * span granularity, for surgical redaction instead of whole-doc drops
    * (dropping a 50k-token doc over one quoted benchmark sentence wastes
    * the other 49k tokens).
    *
    * Same candidates-then-verify shape as
    * [[graft.pipeline.Dedup.duplicateSpans]]: train window HASHES
    * ([[graft.functions.GramHashes]] — nothing wider than
    * `(id, start, hash)` leaves the scan) are semi-joined against the
    * broadcast benchmark hash set, survivors re-verified against the exact
    * benchmark gram TEXT (also broadcast — the benchmark is small by
    * definition), then merged per-doc into maximal spans. A hash collision
    * costs a false candidate, never a false span.
    *
    * Output: `(id, span_start, span_end, span_len, n_windows)`, 1-based
    * inclusive positions in the normalized token stream. */
  def contaminationSpans(train: DataFrame, bench: DataFrame,
                         textCol: String, idCol: String, n: Int): DataFrame = {
    import graft.functions.TextSketchFunctions.gram_hashes
    require(n >= 1, "window width must be >= 1")
    // bench (hash, gram) pairs: positional hashes zipped with the gram text
    // re-sliced from the same token array, then distinct
    val benchToks = bench.select(Dedup.tokens(col(textCol)).as("tk"))
    val benchGrams = benchToks
      .select(col("tk"), posexplode(gram_hashes(col("tk"), n)))
      .select(col("col").as("h"),
        concat_ws(" ", slice(col("tk"), col("pos") + 1, lit(n))).as("gram"))
      .distinct()
    val toks = train.select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("tk"))
    val windows = toks
      .select(col("id"), posexplode(gram_hashes(col("tk"), n)))
      .select(col("id"), (col("pos") + 1).as("st"), col("col").as("h"))
    val candWindows = windows
      .join(broadcast(benchGrams.select("h").distinct()), Seq("h"), "left_semi")
    val candIds = broadcast(candWindows.select("id").distinct())
    val candToks = toks.join(candIds, Seq("id"), "left_semi")
    val marked = candWindows
      .join(candToks, Seq("id"))
      .withColumn("gram", concat_ws(" ", slice(col("tk"), col("st"), lit(n))))
      .join(broadcast(benchGrams.select("gram").distinct()), Seq("gram"), "left_semi")
      .select("id", "st")
    Dedup.spansFromMarked(marked, n, idCol)
  }

  /** Surgical decontamination: redact exactly the leaked spans, keep the
    * rest of every doc — `(id, clean_text, n_tokens, removed_tokens)` in
    * the normalized token stream (docs without leaks pass through,
    * `removed_tokens = 0`). */
  def removeContaminatedSpans(train: DataFrame, bench: DataFrame,
                              textCol: String, idCol: String, n: Int): DataFrame =
    Dedup.removeSpans(train,
      contaminationSpans(train, bench, textCol, idCol, n), textCol, idCol)

  // ------------------------------------------------------------------- PII

  /** (pattern, replacement) in application order. Conservative,
    * deterministic regexes (no lookaround — portable to RE2-class engines):
    * emails first (their local parts can contain digits and dots that the
    * narrower patterns would chew on), then structured phone numbers
    * (TPC-H `NN-NNN-NNN-NNNN` style), then dotted-quad IPs. */
  private val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{2}-\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Redacted copy of a text column — all three PII classes masked. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (rx, mask)) =>
      regexp_replace(c, rx, mask)
    }

  /** Per-row PII counts + redacted text. Narrow map — stays inside
    * whole-stage codegen at the scan; nothing shuffles. */
  def piiReport(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", size(regexp_extract_all(t, lit(PiiPatterns(0)._1), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PiiPatterns(1)._1), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(PiiPatterns(2)._1), lit(0))))
      .withColumn("redacted", redactPii(t))
  }

  // ---------------------------------------------------------- domain mixing

  /** Per-domain sampling plan to hit a target token budget: for each value
    * of `domainCol`, the fraction of docs to keep so that expected kept
    * tokens ≈ `targetTokens` (capped at 1.0 — domains under budget are
    * kept whole; upsampling is out of scope). One map-side-combinable
    * aggregate over (domain) — domain cardinality is small by nature, so
    * the result is driver-broadcastable to the sampling pass. */
  def mixPlan(df: DataFrame, domainCol: String, textCol: String,
              targetTokens: Long): DataFrame =
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
           sum(TextStats.tokenCount(col(textCol))).as("n_tokens"))
      .withColumn("keep_frac",
        least(lit(1.0), lit(targetTokens.toDouble) / col("n_tokens")))

  /** Temperature-scaled domain mixing weights — the multilingual-pretraining
    * convention (sampling probability ∝ share^alpha): flattens the domain
    * distribution toward uniform as alpha → 0, keeps it natural at
    * alpha = 1. For each domain: `weight = share^alpha / Σ share^alpha`
    * and the per-domain keep fraction that realizes a `targetTokens`
    * budget mixed by those weights (capped at 1 — no upsampling, like
    * [[mixPlan]]). alpha = 0.5 (the common choice) computes via sqrt —
    * correctly-rounded IEEE, so the plan is bit-stable across engines.
    * Same shape as [[mixPlan]]: one map-side-combinable aggregate over the
    * domain key plus a broadcast single-row total — never a global window. */
  def mixTemperature(df: DataFrame, domainCol: String, textCol: String,
                     targetTokens: Long, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperature alpha must be in (0, 1], got $alpha")
    val stats = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
           sum(TextStats.tokenCount(col(textCol))).as("n_tokens"))
    val scaled = stats.withColumn("_w_raw",
      // share^alpha = n^alpha / N^alpha; the N^alpha factor cancels in the
      // normalization, so raw = n_tokens^alpha avoids one division
      if (alpha == 0.5) sqrt(col("n_tokens").cast("double"))
      else pow(col("n_tokens").cast("double"), lit(alpha)))
    val total = scaled.agg(sum(col("_w_raw")).as("_w_total"))
    scaled.crossJoin(broadcast(total))
      .withColumn("weight", col("_w_raw") / col("_w_total"))
      .withColumn("keep_frac",
        least(lit(1.0), lit(targetTokens.toDouble) * col("weight") / col("n_tokens")))
      .drop("_w_raw", "_w_total")
  }

  /** Fractional-epoch dataset mixing — the Dolma/LLaMA recipe notation
    * ("2.5 epochs of wiki, 0.3 of books"): a domain's docs each repeat
    * ⌊e⌋ times, plus once more when the doc's scrambled NUMERIC id lands
    * inside the fractional remainder (the same LCG convention as the
    * random_sampler aggregation — deterministic at any partitioning AND
    * expressible in plain integer SQL, so the oracle verifies the exact
    * row multiset, not just counts). Output rows carry `epoch` (0-based
    * copy index). One narrow projection + an inline sequence explode —
    * no shuffle, no join, upsampling never materializes the corpus more
    * than the recipe demands. Domains absent from the map are DROPPED
    * (a silent 1.0 default would unbalance the recipe). */
  def mixEpochs(df: DataFrame, idCol: String, domainCol: String,
                epochs: Map[String, Double], seed: Long = 0L): DataFrame = {
    require(epochs.nonEmpty, "epochs map is empty")
    require(epochs.values.forall(e => e >= 0 && e <= 1000),
      s"epochs must be in [0, 1000]")
    require(seed >= 0 && seed <= 1000000L, s"seed must be in [0, 1e6], got $seed")
    val buckets = 1000000L
    val b = pmod((pmod(col(idCol).cast("long"), lit(1000003L)) + lit(seed)) *
      lit(1103515245L) + lit(12345L), lit(buckets))
    val e = epochs.toSeq.sortBy(_._1).foldLeft(lit(-1.0)) {
      case (acc, (dom, ep)) =>
        when(col(domainCol) === dom, lit(ep)).otherwise(acc)
    }
    val copies = floor(e).cast("long") +
      when(b < ((e - floor(e)) * buckets).cast("long"), 1L).otherwise(0L)
    df.where(e >= 0)
      .withColumn("_copies", copies)
      .where(col("_copies") > 0) // sequence(0, -1) DESCENDS — guard first
      .withColumn("epoch", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_copies")
  }

  /** Deterministic stratified sample: per-domain keep fractions (e.g. from
    * [[mixPlan]]), hash-bucketed on the id so the decision is retry- and
    * join-stable like [[Sampling.deterministicSample]]. Unlisted domains
    * are dropped. Narrow filter — no shuffle. */
  def sampleStratified(df: DataFrame, idCols: Seq[String], domainCol: String,
                       fractions: Map[String, Double], seed: Long = 0L): DataFrame = {
    require(fractions.nonEmpty && fractions.values.forall(f => f >= 0 && f <= 1),
      "fractions must be in [0,1]")
    val buckets = 1000000L
    val b = pmod(xxhash64(idCols.map(col) :+ lit(seed): _*), lit(buckets))
    val thresh = fractions.foldLeft(lit(-1L)) { case (acc, (dom, f)) =>
      when(col(domainCol) === dom, lit((f * buckets).toLong)).otherwise(acc)
    }
    df.where(b < thresh)
  }

  // -------------------------------------------------------- leakage-safe split

  /** Train/val/test split that keeps near-duplicates on the SAME side.
    *
    * A plain per-doc hash split leaks: a test doc's near-duplicate lands
    * in train and the model "memorizes" the answer. Here every doc is
    * split by its near-dup CLUSTER's canonical id (docs with no near-dup
    * cluster with themselves), so whole duplicate groups co-travel.
    *
    * Scale shape: the duplicate-pair graph is model-sized ([[Dedup
    * .clusters]]); the label join touches only docs that HAVE a near-dup
    * (broadcast-friendly), everything else is the usual narrow hash
    * filter. Returns the input schema plus a `split` index column in
    * weight order. */
  def leakageSafeSplit(docs: DataFrame, textCol: String, idCol: String,
                       weights: Seq[Double], seed: Long = 0L): DataFrame =
    leakageSafeSplitFromPairs(docs,
      Dedup.minhashPairs(docs, textCol, idCol), idCol, weights, seed)

  /** [[leakageSafeSplit]] over an ALREADY-COMPUTED near-dup pair set —
    * the shape a real pipeline uses: the pair graph is the expensive
    * corpus pass and usually exists already (dedup ran first, or pairs
    * came from the sketch store); splitting must not re-pay it. Pairs
    * must carry `id_a`/`id_b` ([[Dedup.minhashPairs]]'s schema). */
  def leakageSafeSplitFromPairs(docs: DataFrame, pairs: DataFrame,
                                idCol: String, weights: Seq[Double],
                                seed: Long = 0L): DataFrame = {
    val labels = Dedup.clusters(pairs)
      .select(col("id").as(idCol), col("cluster_id"))
    val keyed = docs.join(labels, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col(idCol)))
    keyed
      .withColumn("split", Sampling.splitColumn(Seq("split_key"), weights, seed))
      .drop("cluster_id", "split_key")
  }

  // ------------------------------------------------------------- end-to-end

  /** The whole curation pipeline, composed: near-dup removal (keep the
    * canonical member per cluster), Gopher/C4-style quality gate, then
    * benchmark decontamination. Returns surviving docs with the input
    * schema. Each stage is independently oracle-verified; the composition
    * adds no new shuffle shape — LSH bucket join + narrow quality filter +
    * broadcast gram join. */
  def curateCorpus(docs: DataFrame, bench: DataFrame,
                   textCol: String, idCol: String,
                   minTokens: Int = 10, maxMeanTokLen: Double = 12.0,
                   minStopwordRatio: Double = 0.0, n: Int = 4): DataFrame = {
    val deduped = Dedup.dedupCorpus(docs, textCol, idCol)
    val quality = TextStats.qualityFilter(deduped, textCol,
        minTokens = minTokens, maxMeanTokLen = maxMeanTokLen,
        minStopwordRatio = minStopwordRatio)
      .select(docs.columns.map(col).toIndexedSeq: _*)
    decontaminate(quality, bench, textCol, idCol, n)
  }

  // --------------------------------------------------------- sequence packing

  /** Greedy shard packing: docs are laid out in (`groupCol`, `idCol`) order
    * and cut into shards of ~`budgetTokens` tokens; a doc is never split, so
    * a shard can overshoot by at most one doc. `shard = floor(tokens-before-
    * this-doc / budget)` — pure window arithmetic, deterministic, and
    * identical under any parallelism.
    *
    * Scale shape: one shuffle on `groupCol` (the natural write partitioning
    * for the shard files); the window is a running sum, no global sort.
    * Degenerate single-group inputs serialize into one partition — callers
    * packing an unpartitioned corpus should pass a synthetic group (e.g.
    * `hash(id) % k`) sized so a group's docs fit one executor. */
  def packSequences(df: DataFrame, idCol: String, groupCol: String,
                    textCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", TextStats.tokenCount(col(textCol)))
      .withColumn("shard",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(budgetTokens)))
      .select(col(idCol), col(groupCol), col("n_tokens"), col("shard"))
  }

  /** Semantic decontamination: drop training rows whose embedding lands
    * within `threshold` cosine of ANY benchmark embedding — the
    * embedding-space twin of the n-gram [[decontaminate]]. The benchmark
    * is small by definition, so it broadcasts and the train side streams
    * through ONE scan as a left-anti non-equi join (NOT EXISTS) — never a
    * shuffled all-pairs product. */
  def decontaminateSemantic(train: DataFrame, bench: DataFrame,
                            vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.VecFunctions.vec_cosine
    import org.apache.spark.sql.functions.broadcast
    val b = broadcast(bench
      .select(col(vecCol).cast("array<double>").as("_bench_vec")))
    train.join(b,
      vec_cosine(col(vecCol).cast("array<double>"), col("_bench_vec"))
        >= threshold,
      "left_anti")
  }

  // ------------------------------------------------------------ url filtering

  /** URL/domain filtering report (the RefinedWeb/C4 provenance gate):
    * host + TLD extraction, domain blocklist (exact or subdomain match),
    * TLD allowlist, and the combined keep flag. Pure regex/equality
    * column work — a narrow codegen'd projection; the blocklist rides the
    * plan as literals (curated blocklists are model parameters, not data;
    * for million-entry lists switch to a broadcast anti-join on `host`). */
  def urlReport(df: DataFrame, urlCol: String, blockedDomains: Seq[String],
                allowedTlds: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty && allowedTlds.nonEmpty,
      "urlReport needs non-empty blockedDomains and allowedTlds")
    val host = lower(regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    val tld = regexp_extract(host, "\\.([a-z0-9-]+)$", 1)
    df.withColumn("host", host)
      .withColumn("tld", tld)
      .withColumn("domain_blocked",
        blockedDomains.map(d => col("host") === d ||
          col("host").endsWith("." + d)).reduce(_ || _))
      .withColumn("tld_allowed", col("tld").isin(allowedTlds: _*))
      .withColumn("url_keep",
        length(col("host")) > 0 && !col("domain_blocked") && col("tld_allowed"))
  }

  /** Corpus-level boilerplate removal: drop every LINE that repeats across
    * `minDocs`+ distinct documents of the same group (site/source) —
    * headers, footers, nav bars, cookie banners; the cross-document
    * complement of the per-document C4 line rules. Two-phase, scale-safe:
    *
    *  1. distinct (group, line, doc) → one hash aggregate per (group,
    *     line) counts supporting DOCS (a doc repeating its own header
    *     still counts once);
    *  2. qualifying lines aggregate into one per-group array — bounded by
    *     construction (a line must appear in ≥ minDocs docs, so a group
    *     contributes at most lines/minDocs entries; real boilerplate sets
    *     are tiny) — which joins back BROADCAST onto the doc table, and
    *     each doc's text filters through a higher-order lambda: the wide
    *     corpus rows never shuffle.
    *
    * Returns the frame with `text_clean` (boilerplate lines removed, line
    * order preserved) and `n_boiler` (lines dropped). */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       groupCol: String, minDocs: Long = 5L): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = split(col(textCol), "\n")
    val support = df
      .select(col(idCol), col(groupCol), explode(lines).as("_line"))
      .distinct()
      .groupBy(col(groupCol), col("_line"))
      .agg(count(lit(1)).as("_n"))
      .where(col("_n") >= minDocs)
    val badPerGroup = support.groupBy(col(groupCol))
      .agg(collect_list(col("_line")).as("_bad"))
    val bad = coalesce(col("_bad"), array().cast("array<string>"))
    df.join(broadcast(badPerGroup), Seq(groupCol), "left")
      .withColumn("text_clean", array_join(
        filter(lines, l => !exists(bad, b => b === l)), "\n"))
      .withColumn("n_boiler",
        size(lines) - size(filter(lines, l => !exists(bad, b => b === l))))
      .drop("_bad")
  }
}
