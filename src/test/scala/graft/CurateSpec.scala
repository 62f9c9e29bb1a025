package graft

import graft.pipeline.Curate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus curation: decontamination, PII redaction, domain mixing,
  * sequence packing. */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("contamination flags exactly the docs sharing an n-gram (and counts them)") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely different sentence with no overlap at all"),
      (3L, "speaking of the quick brown fox it is back again"),
      (4L, "quick brown dog")).toDF("doc_id", "text")
    val bench = Seq((100L, "watch the quick brown fox run")).toDF("doc_id", "text")

    val report = Curate.contaminationReport(train, bench, "text", "doc_id", n = 3)
      .orderBy("doc_id").as[(Long, Long)].collect()
    // bench 3-grams: {watch the quick, the quick brown, quick brown fox, brown fox run}
    // doc1 shares 2 (the quick brown, quick brown fox); doc3 the same 2; doc2/4 none
    assert(report.toSeq == Seq((1L, 2L), (3L, 2L)))

    val clean = Curate.decontaminate(train, bench, "text", "doc_id", n = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(clean.toSeq == Seq(2L, 4L))
  }

  test("contamination spans cover exactly the leaked run; removal is surgical") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "intro words here alpha beta gamma delta epsilon zeta trailing bit"),
      (2L, "totally clean document with original content only here"))
      .toDF("doc_id", "text")
    val spans = Curate.contaminationSpans(train, bench, "text", "doc_id", n = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(4)))
    // the 6-token benchmark run sits at positions 4..9; three 4-windows
    assert(spans.toSeq == Seq((1L, 4, 9, 3L)))
    val out = Curate.removeContaminatedSpans(train, bench, "text", "doc_id", n = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, "intro words here trailing bit", 6),
      (2L, "totally clean document with original content only here", 0)))
  }

  test("contamination gram-match is a broadcast join; only ids aggregate") {
    val train = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq((2L, "b c d e")).toDF("doc_id", "text")
    val plan = Curate.contaminationReport(train, bench, "text", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("PII redaction masks emails, phones, IPs and counts each class") {
    val df = Seq(
      (1L, "mail jane.doe+x@corp.example.com or 25-989-741-2988 from 10.0.0.1"),
      (2L, "no pii here, just 12345 and a-b-c"),
      (3L, "two mails a@b.io c@d.org and ip 192.168.1.255")).toDF("id", "text")
    val r = Curate.piiReport(df, "text").orderBy("id")
      .select("n_emails", "n_phones", "n_ips", "redacted")
      .as[(Int, Int, Int, String)].collect()
    assert(r(0) == ((1, 1, 1, "mail <EMAIL> or <PHONE> from <IP>")))
    assert(r(1) == ((0, 0, 0, "no pii here, just 12345 and a-b-c")))
    assert(r(2) == ((2, 0, 1, "two mails <EMAIL> <EMAIL> and ip <IP>")))
  }

  test("piiReport is a narrow map — no exchange in the plan") {
    val df = Seq((1L, "x@y.zz")).toDF("id", "text")
    val plan = Curate.piiReport(df, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("mixPlan computes capped per-domain keep fractions") {
    val df = Seq(
      ("big", "one two three four"), ("big", "five six seven eight"),
      ("small", "just two")).toDF("dom", "text")
    val plan = Curate.mixPlan(df, "dom", "text", targetTokens = 4L)
      .orderBy("dom").select("dom", "n_docs", "n_tokens", "keep_frac")
      .as[(String, Long, Long, Double)].collect()
    // big: 8 tokens, target 4 → 0.5; small: 2 tokens, under budget → capped 1.0
    assert(plan.toSeq == Seq(("big", 2L, 8L, 0.5), ("small", 1L, 2L, 1.0)))
  }

  test("stratified sample hits per-domain fractions, deterministic, drops unlisted") {
    val df = (0L until 30000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "dom")
    val fr = Map("a" -> 0.5, "b" -> 0.1) // c unlisted → dropped
    val s1 = Curate.sampleStratified(df, Seq("id"), "dom", fr, seed = 9L)
    val byDom = s1.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom.keySet == Set("a", "b"))
    assert(math.abs(byDom("a") - 5000L) < 300, byDom.toString)
    assert(math.abs(byDom("b") - 1000L) < 150, byDom.toString)
    val s2 = Curate.sampleStratified(df, Seq("id"), "dom", fr, seed = 9L)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
  }

  test("fractional-epoch mixing: exact integral repeats, LCG fractional pick") {
    val df = (0L until 9000L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "dom")
    val out = Curate.mixEpochs(df, "id", "dom",
      Map("a" -> 2.0, "b" -> 1.4), seed = 3L) // c unlisted → dropped
    val byDom = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom.keySet == Set("a", "b"))
    assert(byDom("a") == 6000L) // integral epochs repeat EXACTLY
    assert(math.abs(byDom("b") - 4200L) < 200, byDom.toString)
    // copy indices are dense 0..copies-1 per doc
    val epochs = out.where($"dom" === "a").groupBy("id")
      .agg(org.apache.spark.sql.functions.collect_list("epoch").as("es"))
      .select("es").as[Seq[Long]].collect()
    assert(epochs.forall(_.sorted == Seq(0L, 1L)))
    // deterministic across runs
    val again = Curate.mixEpochs(df, "id", "dom",
      Map("a" -> 2.0, "b" -> 1.4), seed = 3L)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }

  test("leakage-safe split keeps near-dup clusters on one side, covers, splits fairly") {
    // 3000 docs in near-dup pairs (2i, 2i+1 share text) + 4000 singletons
    val docs = ((0L until 3000L).map(i => (i, s"group text number ${i / 2} padded with words")) ++
      (10000L until 14000L).map(i => (i, s"unique standalone document $i with its own words")))
      .toDF("doc_id", "text")
    val out = graft.pipeline.Curate.leakageSafeSplit(docs, "text", "doc_id",
      Seq(0.8, 0.1, 0.1), seed = 3L)
    assert(out.count() == 7000L)                          // cover, nothing lost
    // near-dup mates always co-travel
    val mates = out.where(col("doc_id") < 3000L)
      .withColumn("grp", (col("doc_id") / 2).cast("long"))
      .groupBy("grp").agg(countDistinct(col("split")).as("nsplits"))
    assert(mates.where(col("nsplits") > 1).count() == 0)
    // fractions hold approximately over clusters+singletons
    val byS = out.groupBy("split").count().as[(Int, Long)].collect().toMap
    assert(math.abs(byS(0) - 5600L) < 400, byS.toString)
    assert(math.abs(byS(1) - 700L) < 250, byS.toString)
    assert(math.abs(byS(2) - 700L) < 250, byS.toString)
  }

  test("curateCorpus composes dedup, quality gate, and decontamination") {
    val good = "the quick brown fox and the lazy dog walk to town in a light rain"
    val train = Seq(
      (1L, good),                                        // survivor
      (2L, good + " today"),                             // near-dup of 1 → dropped
      (3L, "tiny"),                                      // fails minTokens → dropped
      (4L, "the old mill by the river keeps grinding its wheat in the morning sun"),
      (5L, "the secret benchmark sentence appears here verbatim and it is long enough to pass the quality gate")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "we know the secret benchmark sentence appears here"))
      .toDF("doc_id", "text")
    val out = Curate.curateCorpus(train, bench, "text", "doc_id",
        minTokens = 5, maxMeanTokLen = 12.0, minStopwordRatio = 0.0, n = 4)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 4L)) // 2 deduped, 3 low-quality, 5 contaminated
  }

  test("packing fills shards to budget without splitting docs; stable arithmetic") {
    val df = Seq(
      (1L, "g1", "a b c"), (2L, "g1", "d e f g"), (3L, "g1", "h i"),
      (4L, "g1", "j k l m n"), (5L, "g2", "o p")).toDF("id", "grp", "text")
    val packed = Curate.packSequences(df, "id", "grp", "text", budgetTokens = 5L)
      .orderBy("grp", "id").select("id", "n_tokens", "shard")
      .as[(Long, Long, Long)].collect()
    // g1 cumulative-before: doc1=0→s0, doc2=3→s0, doc3=7→s1, doc4=9→s1; g2: doc5=0→s0
    assert(packed.toSeq == Seq((1L, 3L, 0L), (2L, 4L, 0L), (3L, 2L, 1L), (4L, 5L, 1L), (5L, 2L, 0L)))
  }

  test("packing shards never lose or duplicate docs; assignment matches the contract") {
    val df = (0L until 1000L).map(i => (i, s"g${i % 7}", ("w " * (1 + (i % 13).toInt)).trim))
      .toDF("id", "grp", "text")
    val packed = Curate.packSequences(df, "id", "grp", "text", budgetTokens = 40L)
    assert(packed.count() == 1000L)
    assert(packed.select("id").distinct().count() == 1000L)
    // independent re-derivation of the contract: shard = floor(tokens-before/B)
    // within (grp, id-order) — verified sequentially per group in plain Scala
    val rows = packed.orderBy("grp", "id")
      .select("grp", "id", "n_tokens", "shard")
      .as[(String, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var before = 0L
      docs.sortBy(_._2).foreach { case (_, _, tok, shard) =>
        assert(shard == before / 40L, s"doc before=$before tok=$tok shard=$shard")
        before += tok
      }
    }
  }

  test("decontaminateSemantic: near-benchmark embeddings drop, others stay") {
    val train = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.98f, 0.05f))).toDF("vec_id", "embedding")
    val bench = Seq((100L, Seq(0.99f, 0.1f))).toDF("vec_id", "embedding")
    val kept = Curate.decontaminateSemantic(train, bench, "embedding", 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L)) // 1 and 3 are near-parallel to the bench vector
  }

  test("urlReport: host/tld extraction, blocklist, subdomain match, allowlist") {
    val df = Seq(
      (1L, "https://news.example.com/a"),
      (2L, "https://ads.example.com/b"),
      (3L, "https://x.ads.example.com/c"),   // subdomain of a blocked domain
      (4L, "https://fine.example.xyz/d"),    // TLD outside the allowlist
      (5L, "not a url"))
      .toDF("id", "url")
    val out = Curate.urlReport(df, "url",
        blockedDomains = Seq("ads.example.com"), allowedTlds = Seq("com"))
      .select("id", "host", "tld", "domain_blocked", "url_keep")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, "news.example.com", "com", false, true),
      (2L, "ads.example.com", "com", true, false),
      (3L, "x.ads.example.com", "com", true, false),
      (4L, "fine.example.xyz", "xyz", false, false),
      (5L, "", "", false, false))) // unparseable → empty host, never kept
  }

  test("gopher + c4 reports: rule-by-rule booleans on crafted docs") {
    import graft.pipeline.TextStats
    val good = ("the data rows join the scan " * 12).trim       // 72 words
    val short = "tiny doc"
    val symbols = (("# " * 40) + "the data scan join ").trim    // symbol-heavy
    val df = Seq((1L, good), (2L, short), (3L, symbols)).toDF("id", "text")
    val g = TextStats.qualityGopher(df, "text", minWords = 50,
        stops = Seq("the", "data", "join", "scan"))
      .select("id", "g_word_count", "g_symbol_ratio", "g_stopwords", "gopher_pass")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    assert(g == Set((1L, true, true, true, true),
      (2L, false, true, false, false),
      (3L, false, false, true, false)))
    val page = "A good first sentence here.\nshort one\n" +
      "uses javascript heavily today.\nthe closing line stands well. ok? yes! fine. sure."
    val c4 = TextStats.c4Report(Seq((1L, page)).toDF("id", "text"), "text")
      .select("n_lines", "n_kept_lines", "n_sentences", "c4_keep")
      .collect().head
    // 4 lines; 'short one' (<3 words) and the javascript line drop → 2 kept
    assert(c4.getInt(0) == 4 && c4.getInt(1) == 2)
    assert(c4.getInt(2) == 7 && c4.getBoolean(3))
    val braced = TextStats.c4Report(
        Seq((1L, "good line stays here. { " + page)).toDF("id", "text"), "text")
      .select("c4_keep").collect().head.getBoolean(0)
    assert(!braced)
  }

  test("normalizeText and corpusStats") {
    import graft.pipeline.TextStats
    val out = Seq((1L, "“hi” – x​  y\t z "))
      .toDF("id", "t")
      .select(TextStats.normalizeText(col("t")).as("n"))
      .collect().head.getString(0)
    assert(out == "\"hi\" - x y z")
    val stats = TextStats.corpusStats(
        Seq((1L, "a b c", "en"), (2L, "d e", "en"), (3L, "f g h i", "de"))
          .toDF("id", "text", "lang"), "text", dims = Seq("lang"))
      .collect().head
    assert(stats.getLong(0) == 3L && stats.getLong(1) == 9L) // docs, tokens
    assert(stats.getDouble(3) == 3.0)                        // p50
    assert(stats.getLong(6) == 2L)                           // n_lang
  }

  test("classifierLogit: unigram+bigram feature count, integer-exact sum, " +
       "identical text → identical score, empty text → zero features") {
    import graft.pipeline.TextStats
    val df = Seq((1L, "spark rocks hard"), (2L, "spark rocks hard"),
        (3L, "!!! 123"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextStats.classifierLogit(df, "text")
      .select("doc_id", "w_sum", "n_feats").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out(1)._2 == 5)                 // 3 unigrams + 2 bigrams
    assert(out(1) == out(2))               // same text, same hashed features
    assert(out(3) == ((0L, 0)))            // no a-z runs → no features
    assert(out(4)._2 == 1)                 // one unigram, no bigram
    // weights are bounded by construction: |w| <= 500 per feature
    assert(math.abs(out(1)._1) <= 5 * 500L)
    // no shuffle: pure projection
    val plan = TextStats.classifierLogit(df, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }

  test("maskTokens: deterministic per (id, pos, seed); targets recover " +
       "exactly the masked positions; epoch = seed change") {
    import graft.pipeline.TextStats
    val df = Seq((1L, (1 to 40).map(i => s"w$i").mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    def run(seed: Long) = TextStats.maskTokens(df, "doc_id", "text",
        pct = 30, seed = seed)
      .select("doc_id", "masked_text", "targets").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[String](2)))).toMap
    val a = run(0L); val b = run(0L); val c = run(1L)
    assert(a == b)                         // reproducible
    assert(a(1)._1 != c(1)._1)             // new seed, new mask draw
    assert(a(2) == (("", Seq.empty)))      // empty doc → empty pair
    // every [MASK] in the text has exactly one pos:token target, and
    // substituting targets back reconstructs the original
    val toks = a(1)._1.split(" ")
    val targets = a(1)._2.map { t =>
      val Array(p, w) = t.split(":", 2); p.toInt -> w }.toMap
    assert(toks.zipWithIndex.count(_._1 == "[MASK]") == targets.size)
    val restored = toks.zipWithIndex.map { case (t, i0) =>
      if (t == "[MASK]") targets(i0 + 1) else t }.mkString(" ")
    assert(restored == (1 to 40).map(i => s"w$i").mkString(" "))
    assert(targets.nonEmpty && targets.size < 40) // ~30% of 40, not all/none
  }

  test("stripBoilerplate: per-group repeated lines drop, body and order " +
       "survive, own-doc repeats count once, wide rows never shuffle") {
    import graft.pipeline.Curate
    val docs = (1 to 6).map(i => (i.toLong, "siteA",
        s"NAV\nbody $i\nNAV\nCOOKIES")) ++ // NAV twice in one doc: 1 vote
      Seq((7L, "siteB", "NAV\nother body\nEND"),
          (8L, "siteB", "unique only"))
    val df = docs.toDF("doc_id", "grp", "text")
    val out = Curate.stripBoilerplate(df, "doc_id", "text", "grp", minDocs = 5L)
      .select("doc_id", "text_clean", "n_boiler").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    // siteA: NAV (6 docs) and COOKIES (6 docs) strip; bodies unique
    assert(out(1L) == (("body 1", 3)))   // both NAVs + COOKIES dropped
    // siteB: NAV appears in 1 doc there — boilerplate is per-group
    assert(out(7L) == (("NAV\nother body\nEND", 0)))
    assert(out(8L) == (("unique only", 0)))
    // plan: the doc table joins the per-group array broadcast — no
    // shuffle of the wide rows into the join
    val plan = Curate.stripBoilerplate(df, "doc_id", "text", "grp")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoop"), plan.take(600))
  }
}
