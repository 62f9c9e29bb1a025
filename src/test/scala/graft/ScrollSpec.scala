package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scroll / PIT pagination + _mget + fuzzy completion + explain. */
class ScrollSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private def docs = (1 to 25).map(i => (i.toLong, s"doc $i", i % 3))
    .toDF("doc_id", "text", "grp")

  test("scroll pages partition the total order exactly, no overlap or gap") {
    val pages = Scroll.pages(docs, Seq("doc_id"), pageSize = 10, maxPages = 5).toSeq
    // 25 rows / size 10 → pages of 10, 10, 5, then an empty page ends it
    val sizes = pages.map(_._2.count())
    assert(sizes == Seq(10, 10, 5, 0), sizes.toString)
    val ids = pages.flatMap(_._2.select("doc_id").as[Long].collect())
    assert(ids == (1L to 25L), ids.toString)
  }

  test("scroll multi-column keyset: composite sort resumes mid-group") {
    val df = Seq((1, 1L), (1, 2L), (1, 3L), (2, 1L), (2, 2L))
      .toDF("g", "id")
    val pages = Scroll.pages(df, Seq("g", "id"), pageSize = 2, maxPages = 5).toSeq
    val got = pages.flatMap(_._2.select("g", "id").as[(Int, Long)].collect())
    assert(got == Seq((1, 1L), (1, 2L), (1, 3L), (2, 1L), (2, 2L)), got.toString)
  }

  test("PIT read pins the file set: later writes to the path are invisible") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pit").toString
    (1 to 5).map(i => (i.toLong, s"v1 $i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val pit = Scroll.openPit(spark.read.parquet(dir))
    // append new data after the snapshot was opened
    (6 to 9).map(i => (i.toLong, s"v2 $i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 9)        // live view sees all
    val snap = Scroll.read(spark, pit)
    assert(snap.count() == 5, "PIT must only read files pinned at open")
    assert(snap.select("id").as[Long].collect().sorted.toSeq == (1L to 5L))
  }

  test("mget returns request order with found=false rows for absent ids") {
    val out = Search.mget(docs, "doc_id", Seq("7", "99", "2"))
      .orderBy("_ord")
      .select("_id", "found", "text").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("7", "99", "2"))
    assert(out.map(_.getBoolean(1)).toSeq == Seq(true, false, true))
    assert(out(1).isNullAt(2), "missing id carries null doc columns")
    assert(out(0).getString(2) == "doc 7" && out(2).getString(2) == "doc 2")
  }

  test("fuzzy completion: context filter + edit-distance-1 prefix, weight-ranked") {
    val corpus = Seq(
      ("1", "scan scan scan small spark", "en"),
      ("2", "sort stream scan", "en"),
      ("3", "scan small", "fr")).toDF("doc_id", "text", "lang")
    val out = Search.completionSuggestFuzzy(corpus, "text", "sca", size = 10,
        contexts = Map("lang" -> Seq("en")), fuzziness = 1, fuzzyPrefixLength = 1)
      .collect()
    // en docs only: scan df=2, small df=1 (sma~sca d1), spark df=1 (spa d1),
    // sort (sor d2) and stream (str d2) excluded
    val got = out.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq(("scan", 2L, 0), ("small", 1L, 1), ("spark", 1L, 1)), got.toString)
  }

  test("fuzziness 0 degenerates to the exact prefix form") {
    val corpus = Seq(("1", "scan small spark", "en")).toDF("doc_id", "text", "lang")
    val got = Search.completionSuggestFuzzy(corpus, "text", "s", size = 10)
      .select("suggestion").as[String].collect().toSeq
    assert(got == Seq("scan", "small", "spark"), got.toString)
  }

  test("termVectors: tf, first position, and corpus df per selected doc") {
    val corpus = Seq(
      ("1", "spark spark scan"), ("2", "scan sort"), ("3", "sort"))
      .toDF("doc_id", "text")
    val out = Search.termVectors(corpus, "doc_id", "text", Seq("1"))
      .orderBy("term").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // spark: tf 2, first pos 1, df 1; scan: tf 1, pos 3, df 2
    assert(out.toSeq == Seq(("scan", 1L, 3L, 2L), ("spark", 2L, 1L, 1L)),
      out.toSeq.toString)
  }

  test("script_score replaces the query score, binds doc fields and params") {
    val corpus = Seq(("1", "spark fast", 10L), ("2", "spark slow", 20L),
        ("3", "flink", 99L)).toDF("doc_id", "text", "n")
    val out = Search.search(corpus,
        """{"query": {"script_score": {
             "query": {"match": {"text": "spark"}},
             "script": {"source": "_score * params.w + doc.n",
                        "params": {"w": 5}}}}}""",
        IndexConfig(), Seq("doc_id"))
      .select("doc_id", "_score").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("1" -> 15L, "2" -> 25L), out.toString) // 1*5 + n
  }

  test("script_score fails loud on unbound identifiers") {
    val corpus = Seq(("1", "x", 1L)).toDF("doc_id", "text", "n")
    val e = intercept[IllegalArgumentException] {
      Search.search(corpus,
        """{"query": {"script_score": {"script": {"source": "mystery + 1"}}}}""",
        IndexConfig(), Seq("doc_id")).collect()
    }
    assert(e.getMessage.contains("unbound identifier"), e.getMessage)
  }

  test("rrf fuses rankings by reciprocal rank; missing docs contribute nothing") {
    val r1 = Seq(("a", 10.0), ("b", 5.0), ("c", 1.0)).toDF("doc_id", "_score")
    val r2 = Seq(("b", 9.0), ("d", 3.0)).toDF("doc_id", "_score")
    val out = Search.rrf(Seq(r1, r2), rankConstant = 1, size = 10)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1) * 1e6).round, r.getInt(2)))
      .toMap
    // b: rank 2 in r1, rank 1 in r2 → 1/3 + 1/2; a: 1/2; c: 1/4; d: 1/3
    assert(out == Map(
      "b" -> (((1.0 / 3 + 1.0 / 2) * 1e6).round, 2),
      "a" -> (500000L, 1), "d" -> ((1e6 / 3).round, 1), "c" -> (250000L, 1)),
      out.toString)
  }

  test("rankEval: precision, recall, mrr, dcg over a rated top-k") {
    val corpus = Seq((1L, "hit one"), (2L, "hit two"), (3L, "hit three"),
      (4L, "miss four")).toDF("doc_id", "text")
    val out = Search.rankEval(corpus,
        Seq(("q", "text:hit", Map("2" -> 1, "3" -> 2, "9" -> 1))),
        IndexConfig(), Seq("doc_id"), k = 2).collect().head
    // hits in order: 1, 2 (k=2). relevant in top-k: doc 2 (rank 2).
    assert(out.getString(0) == "q")
    assert(out.getDouble(1) == 0.5)          // precision 1/2
    assert(math.abs(out.getDouble(2) - 1.0 / 3) < 1e-12) // recall 1/3
    assert(out.getDouble(3) == 0.5)          // mrr: first rel at rank 2
    // dcg: (2^1 - 1)/log2(3)
    assert(math.abs(out.getDouble(4) - 1.0 / (math.log(3) / math.log(2))) < 1e-9)
  }

  test("mixTemperature flattens toward uniform as alpha shrinks") {
    val df = (1 to 90).map(i => ("big", s"tok $i")).toDF("source", "text")
      .unionAll((1 to 10).map(i => ("small", s"tok $i")).toDF("source", "text"))
    val w = pipeline.Curate.mixTemperature(df, "source", "text",
        targetTokens = 100L, alpha = 0.5)
      .select("source", "weight").as[(String, Double)].collect().toMap
    // natural shares 0.9/0.1 → sqrt weights 3:1 (0.75/0.25)
    assert(math.abs(w("big") - 0.75) < 1e-12 && math.abs(w("small") - 0.25) < 1e-12, w.toString)
    assert(math.abs(w.values.sum - 1.0) < 1e-12)
  }

  test("childrenAgg buckets parents with child doc_count and metrics") {
    val parents = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("pid", "seg")
    val children = Seq((1L, 10.0), (1L, 20.0), (2L, 30.0), (3L, 40.0))
      .toDF("fk", "v")
    val out = Aggs.childrenAgg(parents, children, "pid", "fk", "seg",
        childMetrics = """{"avg_v": {"avg": {"field": "v"}}}""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // A: 3 children avg 20; B: 1 child avg 40; C parent has none → absent
    assert(out.toSeq == Seq(("A", 3L, 20.0), ("B", 1L, 40.0)), out.toSeq.toString)
  }

  test("bm25Explain components sum to the bm25 total and match bm25()") {
    val corpus = Seq(
      ("1", "spark query engine"), ("2", "query query planner"),
      ("3", "row store")).toDF("doc_id", "text")
    val plain = Search.bm25(corpus, "text", Seq("spark", "query"))
      .select("doc_id", "_bm25").as[(String, Double)].collect().toMap
    val ex = Search.bm25Explain(corpus, "text", Seq("spark", "query"))
      .select(col("doc_id"), col("_bm25"), col("_explanation")).collect()
    ex.foreach { r =>
      val total = r.getDouble(1)
      assert(math.abs(total - plain(r.getString(0))) < 1e-12)
      val parts = r.getSeq[org.apache.spark.sql.Row](2)
      assert(parts.map(_.getAs[String]("term")).toSeq == Seq("query", "spark"))
      val sum = parts.map(_.getAs[Double]("contrib")).sum
      assert(math.abs(sum - total) < 1e-9, s"contribs $sum != total $total")
    }
  }
}
