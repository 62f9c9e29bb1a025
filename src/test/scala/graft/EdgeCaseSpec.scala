package graft

import graft.pipeline.{Dedup, Sampling, Sessionize, Similarity, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input hardening: every operator family must behave on empty
  * corpora and single-row inputs — a 100 TB pipeline's first dry run is
  * always against an empty partition somewhere. */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def oneDoc = Seq((1L, "solo document text")).toDF("doc_id", "text")

  test("search over an empty corpus returns no rows, no error") {
    assert(Search.search(emptyDocs, "text:x", IndexConfig()).count() == 0)
    assert(Search.searchWithTotal(emptyDocs, "text:x", IndexConfig()).count() == 0)
    assert(Search.withMeta(
      Search.search(emptyDocs, "text:x", IndexConfig())).count() == 0)
  }

  test("bm25 on an empty corpus yields no rows; on one doc a finite score") {
    assert(Search.bm25(emptyDocs, "text", Seq("x")).count() == 0)
    val one = Search.bm25(oneDoc, "text", Seq("solo")).select("_bm25").head.getDouble(0)
    assert(!one.isNaN && !one.isInfinite && one > 0)
  }

  test("dedup family is total on empty and singleton corpora") {
    assert(Dedup.exact(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.exact(oneDoc, "text", "doc_id").count() == 1)
    assert(Dedup.minhashPairs(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.minhashPairs(oneDoc, "text", "doc_id").count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.jaccardPairs(oneDoc, "text", "doc_id", 0.5).count() == 0)
    // corpus dedup of an empty/singleton corpus is the identity
    assert(Dedup.dedupCorpus(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.dedupCorpus(oneDoc, "text", "doc_id").count() == 1)
  }

  test("clusters of an empty pair list is an empty labeling") {
    val pairs = Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "jaccard")
    assert(Dedup.clusters(pairs).count() == 0)
  }

  test("similarity paths handle empty corpora and empty query sets") {
    val emptyVec = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    val oneVec = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(emptyVec, oneVec.select(
      col("vec_id").as("query_id"), col("embedding").as("query_vec")), 5).count() == 0)
    assert(Similarity.bruteForceTopK(oneVec, emptyVec.select(
      col("vec_id").as("query_id"), col("embedding").as("query_vec")), 5).count() == 0)
    assert(Similarity.cosinePairsExact(oneVec, 0.5).count() == 0)
    assert(Similarity.cosinePairs(emptyVec, 0.5).count() == 0)
  }

  test("text operators are total on empty corpora and empty strings") {
    val withEmpty = Seq((1L, ""), (2L, "   "), (3L, "real text here"))
      .toDF("doc_id", "text")
    assert(TextStats.tokenEntropy(withEmpty, "text", "doc_id").count() == 1)
    assert(TextStats.chunk(withEmpty, "text", "doc_id", 4).count() == 1)
    assert(TextStats.vocabulary(emptyDocs, "text", 10).count() == 0)
    val q = TextStats.qualityMetrics(withEmpty, "text")
    assert(q.count() == 3) // metrics defined (greatest(...,1) guards) for all
    assert(TextStats.qualityFilter(withEmpty, "text", minTokens = 1).count() == 1)
  }

  test("sessionize and sampling on empty/single inputs") {
    val emptyEv = Seq.empty[(String, java.sql.Timestamp)].toDF("user_id", "ts")
    assert(Sessionize.summarize(emptyEv, "user_id", "ts", 1800).count() == 0)
    val oneEv = Seq(("u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("user_id", "ts")
    val s = Sessionize.summarize(oneEv, "user_id", "ts", 1800).head
    assert(s.getLong(1) == 1L && s.getLong(2) == 1L) // one session, one event
    assert(Sampling.split(emptyDocs, Seq("doc_id"), Seq(0.5, 0.5)).map(_.count()).sum == 0)
    assert(Sampling.deterministicSample(oneDoc, Seq("doc_id"), 1.0).count() == 1)
    assert(Sampling.deterministicSample(oneDoc, Seq("doc_id"), 0.0).count() == 0)
  }

  test("summarizeNative: session_window semantics incl. the at-gap boundary") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("u1", ts("2024-01-01 00:00:00")),
      ("u1", ts("2024-01-01 00:10:00")),  // within 30 min → same session
      ("u1", ts("2024-01-01 00:40:00")),  // EXACTLY the gap after the last
      ("u1", ts("2024-01-01 02:00:00")),  // far → third session
      ("u2", ts("2024-01-01 00:05:00")))
      .toDF("user_id", "ts")
    val out = Sessionize.summarizeNative(ev, "user_id", "ts", "30 minutes")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    // the at-gap 00:40 event MERGES (inclusive boundary, same as the
    // custom `>`-gap twin): u1 = {00:00,00:10,00:40} + {02:00}
    assert(out == Seq(("u1", 3L), ("u1", 1L), ("u2", 1L)))
    assert(Sessionize.summarize(ev, "user_id", "ts", 1800).count() == 3)
    // end = last event + gap, start = first event
    val first = Sessionize.summarizeNative(ev, "user_id", "ts", "30 minutes")
      .orderBy("user_id", "session_start").collect().head
    assert(first.getTimestamp(1) == ts("2024-01-01 00:00:00"))
    assert(first.getTimestamp(2) == ts("2024-01-01 01:10:00"))
  }

  test("indexer paths on empty batches") {
    val docs = Seq(("k1", 1L, "v")).toDF("doc_id", "ver", "v")
    val empty = Seq.empty[(String, Long, String)].toDF("doc_id", "ver", "v")
    // empty update batch: store unchanged (both merge and replace paths)
    assert(Indexer.upsert(docs, empty, "doc_id", Seq("ver")).count() == 1)
    assert(Indexer.upsert(docs, empty, "doc_id", Seq("ver"),
      IndexConfig(insertOnly = true)).count() == 1)
    // empty store: batch lands whole
    assert(Indexer.upsert(empty, docs, "doc_id", Seq("ver")).count() == 1)
    assert(Indexer.delete(docs, empty.select("doc_id"), Seq("doc_id")).count() == 1)
    assert(Indexer.exactlyOnce(empty, "doc_id", "ver").count() == 0)
    assert(Indexer.fromBulkNdjson(
      Indexer.toBulkNdjson(empty, "idx").select("bulk"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType)))).count() == 0)
  }

  test("round-4 operators are total on empty/degenerate inputs") {
    import spark.implicits._
    // empty processor list → identity transform
    val docs = Seq(("1", "v")).toDF("doc_id", "v")
    assert(IngestPipeline.compile("""{"processors":[]}""")(docs)
      .collect().sameElements(docs.collect()))
    // compaction of a nonexistent store is a no-op, not an error
    assert(Maintain.compactSegments(spark, "/tmp/graft_no_such_store_xyz",
      "segment").isEmpty)
    // empty sketch store → empty pair set (not a head-of-empty crash)
    val path = java.nio.file.Files.createTempDirectory("graft_empty_store").toString
    graft.pipeline.Dedup.writeSketchStore(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), path, "text", "doc_id")
    assert(graft.pipeline.Dedup.minhashPairsFromStore(spark, path).count() == 0)
    // multi_match over one field ≡ plain match (scoring and predicate)
    val d = Seq(("1", "spark rules"), ("2", "other")).toDF("doc_id", "text")
    val multi = Search.search(d, """{"query":{"multi_match":{"query":"spark","fields":["text"]}}}""",
      IndexConfig()).select("doc_id", "_score").collect().toSeq
    val single = Search.search(d, """{"query":{"match":{"text":"spark"}}}""",
      IndexConfig()).select("doc_id", "_score").collect().toSeq
    assert(multi == single)
  }

  test("curation family is total on empty and degenerate inputs") {
    import graft.pipeline.Curate
    // empty train, empty bench, both
    assert(Curate.contaminationReport(emptyDocs, oneDoc, "text", "doc_id", 3).count() == 0)
    assert(Curate.contaminationReport(oneDoc, emptyDocs, "text", "doc_id", 3).count() == 0)
    assert(Curate.decontaminate(oneDoc, emptyDocs, "text", "doc_id", 3).count() == 1)
    assert(Curate.curateCorpus(emptyDocs, emptyDocs, "text", "doc_id").count() == 0)
    // PII on empty strings and empty corpus
    assert(Curate.piiReport(emptyDocs, "text").count() == 0)
    val pii = Curate.piiReport(Seq((1L, "")).toDF("doc_id", "text"), "text")
      .select("n_emails", "n_phones", "n_ips").head
    assert((pii.getInt(0), pii.getInt(1), pii.getInt(2)) == ((0, 0, 0)))
    // mixing and packing on empty corpus; packing with budget 1
    assert(Curate.mixPlan(emptyDocs.withColumn("src", lit("a")), "src", "text", 10L).count() == 0)
    assert(Curate.packSequences(emptyDocs.withColumn("src", lit("a")),
      "doc_id", "src", "text", 100L).count() == 0)
    val tiny = Curate.packSequences(
      Seq((1L, "a", "one two"), (2L, "a", "three")).toDF("id", "src", "text"),
      "id", "src", "text", budgetTokens = 1L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(tiny == Map(1L -> 0L, 2L -> 2L)) // cum-before 0 then 2, budget 1
    // stratified sample with a fraction of exactly 0 and exactly 1
    val df01 = (0L until 100L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "dom")
    val s = Curate.sampleStratified(df01, Seq("id"), "dom", Map("a" -> 1.0, "b" -> 0.0))
    assert(s.count() == 50 && s.where(col("dom") === "b").count() == 0)
    // leakage-safe split of a corpus with no near-dups = plain cover
    assert(Curate.leakageSafeSplit(oneDoc, "text", "doc_id", Seq(0.5, 0.5)).count() == 1)
    // repetition metrics on empty text: one truncated window, top=1, dup=0
    val rep = TextStats.repetitionMetrics(
      Seq((1L, "")).toDF("doc_id", "text"), "text", "doc_id", 2).head
    assert((rep.getDouble(1), rep.getDouble(2), rep.getLong(3)) == ((1.0, 0.0, 1L)))
  }

  test("round-5 operators are total on empty/degenerate inputs") {
    // span dedup: empty corpus, and a corpus where every doc is below the
    // window floor, both yield empty results and a pass-through removal
    assert(Dedup.duplicateSpans(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.removeDuplicateSpans(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.duplicateSpans(oneDoc, "text", "doc_id", n = 8).count() == 0)
    val passthrough = Dedup.removeDuplicateSpans(oneDoc, "text", "doc_id", n = 8)
      .collect().head
    assert(passthrough.getString(1) == "solo document text" &&
      passthrough.getInt(3) == 0)
    // aggs: empty table -> no buckets; global metrics -> one row of nulls
    // (SQL aggregate semantics); empty-result query filter -> no buckets
    assert(Aggs.runSingle(emptyDocs,
      """{"aggs":{"t":{"terms":{"field":"text"}}}}""").count() == 0)
    val g = Aggs.runSingle(emptyDocs,
      """{"aggs":{"m":{"avg":{"field":"doc_id"}}}}""").collect().head
    assert(g.isNullAt(0))
    assert(Aggs.topHits(oneDoc,
      """{"query":{"match":{"text":"zzz_absent"}},
          "aggs":{"t":{"terms":{"field":"text"},
          "aggs":{"h":{"top_hits":{"size":1,"sort":[{"doc_id":"asc"}]}}}}}}""")
      .count() == 0)
    // PQ: empty corpus refuses to train loudly; training on one vector works
    val emptyVecs = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](pipeline.Pq.train(emptyVecs, m = 2))
    assert(e.getMessage.contains("non-empty"))
    val one = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val cb = pipeline.Pq.train(one, m = 2, ksub = 4, iters = 1)
    assert(pipeline.Pq.encode(one, cb).count() == 1)
    // search_after past the end of the result set: empty page, no error
    assert(Search.search(oneDoc,
      """{"query":{"match":{"text":"solo"}},"search_after":[0,999]}""",
      IndexConfig()).count() == 0)
  }

  test("proximity edge shapes: single-token phrase, huge slop, empty-ish phrase") {
    val d = Seq(("1", "alpha beta gamma")).toDF("doc_id", "text")
    // single-token proximity degrades to a term match
    assert(Search.search(d, """text:"alpha"~3""", IndexConfig()).count() == 1)
    // slop larger than the doc works (regex {0,N} is fine with big N)
    assert(Search.search(d, """text:"alpha gamma"~50""", IndexConfig()).count() == 1)
    // whitespace-only phrase is a loud error, not a silent match-none
    assert(QueryCompiler.validate("""text:"  "~2""").isLeft)
  }

  test("r8 text signals are total on empty/short docs") {
    assert(TextStats.bigramLogLoss(emptyDocs, "text", "doc_id").count() == 0)
    assert(TextStats.dupNgramFraction(emptyDocs, "text", "doc_id", 3).count() == 0)
    // one-token docs have no bigrams/3-grams anywhere -> empty, no error
    val short = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
    assert(TextStats.bigramLogLoss(short, "text", "doc_id").count() == 0)
    assert(TextStats.dupNgramFraction(short, "text", "doc_id", 3).count() == 0)
  }

  test("ES|QL: multi-index FROM unions by name; empty result pipes are total") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, 9L)).toDF("id", "n") // different columns
    val u = Esql.run("FROM a, b | SORT id", Map("a" -> a, "b" -> b)).collect()
    assert(u.length == 2 && u(0).isNullAt(2) && u(1).isNullAt(1))
    assert(Esql.run(
      "FROM a | WHERE id > 100 | STATS c = COUNT(*) BY v | SORT v",
      Map("a" -> a)).count() == 0)
  }

  test("retriever rrf honors a window smaller than size; mixEpochs drops zero-epoch domains") {
    val docs = Seq(("1", "x y"), ("2", "x"), ("3", "x")).toDF("doc_id", "text")
    val out = Search.retriever(docs,
      """{"retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"text": "x"}}}},
            {"standard": {"query": {"match": {"text": "y"}}}}],
          "rank_window_size": 1}}, "size": 10}""",
      IndexConfig(), Seq("doc_id")).count()
    assert(out <= 2) // each child contributes at most window=1 ids
    val mixed = graft.pipeline.Curate.mixEpochs(
      Seq((1L, "a"), (2L, "b")).toDF("id", "dom"), "id", "dom",
      Map("a" -> 0.0, "b" -> 1.0))
    assert(mixed.select("dom").collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("sparse_vector skips docs with a null weight map; analyzeChain on empty text") {
    val docs = Seq(("1", Map("x" -> 1.0)), ("2", null.asInstanceOf[Map[String, Double]]))
      .toDF("doc_id", "weights")
    val hits = Search.search(docs,
      """{"query": {"sparse_vector": {"field": "weights",
          "query_vector": {"x": 1}}}}""",
      IndexConfig(), Seq("doc_id")).select("doc_id").collect().map(_.getString(0))
    assert(hits.toSeq == Seq("1"))
    assert(Maintain.analyzeChain("", "standard",
      Seq("lowercase", "stop", "stemmer")).isEmpty)
  }

  test("r14: word_grams kernel matches the declarative transform/slice form " +
       "— duplicates kept, short docs empty, n=1 identity") {
    import graft.functions.TextSketchFunctions.word_grams
    val docs = Seq(
      ("a", "x y x y x"),          // duplicate bigrams must be KEPT
      ("b", "one"),                // < n tokens -> empty
      ("c", ""),                   // empty text
      ("d", "  padded   spaces  here "),
      ("e", "\u00e9l\u00e8ve caf\u00e9 \u00e9l\u00e8ve")) // multi-byte UTF-8
      .toDF("doc_id", "text")
    val toks = filter(split(lower(trim(col("text"))), "\\s+"),
      x => length(x) > 0)
    for (n <- Seq(1, 2, 3)) {
      val declarative = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
        .otherwise(array())
      val got = docs.select(col("doc_id"), word_grams(toks, n).as("g"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1))
      val want = docs.select(col("doc_id"), declarative.as("g"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1))
      assert(got.toSeq == want.toSeq, s"n=$n")
    }
    // null text stays null-safe (yields no grams downstream of explode)
    val withNull = Seq(("n", null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(withNull.select(explode(word_grams(toks, 2))).count() == 0)
  }
}
