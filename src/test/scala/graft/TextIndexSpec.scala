package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Inverted-index build, cover analysis, candidate pruning, and — the
  * load-bearing contract — bit-identical results vs the scan executor. */
class TextIndexSpec extends AnyFunSuite {
  lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark makes batch fast", "en", "src1"),
    (2L, "batch jobs filter rows", "en", "src2"),
    (3L, "filtering is nicht batch", "de", "src1"),
    (4L, "Spark-streaming handles state", "en", "src3"),
    (5L, "nothing relevant here", "de", "src2"),
    (6L, null, "en", "src1")
  ).toDF("doc_id", "text", "lang", "source")

  private val fields = Set("text", "lang", "source")

  test("buildPostings: tokens are maximal word runs, lowered, distinct") {
    val p = TextIndex.buildPostings(docs, "doc_id", Seq("text"), nBuckets = 8)
    val d4 = p.where($"doc_id" === 4L).select("token").as[String].collect().sorted
    // "Spark-streaming handles state" → the '-' splits a run, case folds
    assert(d4.toSeq == Seq("handles", "spark", "state", "streaming"))
    // null text → no postings, not a null token
    assert(p.where($"doc_id" === 6L).count() == 0)
    // distinct per (token, field, doc_id)
    val dup = p.groupBy("token", "field", "doc_id").count().where($"count" > 1)
    assert(dup.count() == 0)
    // bucket is stable and within range
    assert(p.agg(min("bucket"), max("bucket")).head() match {
      case r => r.getInt(0) >= 0 && r.getInt(1) < 8
    })
  }

  test("cover: AND picks a side, OR needs both, NOT/fuzzy/regex fall back") {
    assert(TextIndex.coverable("text:spark", fields))
    assert(TextIndex.coverable("text:spark OR text:batch", fields))
    assert(TextIndex.coverable("text:filt* AND lang:de", fields))
    // AND with one uncoverable side is still served by the other side
    assert(TextIndex.coverable("text:spark AND text:fuzz~1", fields))
    assert(TextIndex.coverable("text:(spark OR batch)^2 AND -lang:de", fields))
    // OR with an uncoverable branch cannot bound the result
    assert(!TextIndex.coverable("text:spark OR text:fuzz~1", fields))
    assert(!TextIndex.coverable("NOT text:spark", fields))
    assert(!TextIndex.coverable("text:/sp.rk/", fields))
    assert(!TextIndex.coverable("text:\"batch fast\"", fields))   // phrase
    assert(!TextIndex.coverable("text:sp?rk", fields))            // inner wildcard
    assert(!TextIndex.coverable("title:spark", fields))           // unindexed field
    assert(!TextIndex.coverable("""{"query":{"term":{"text":"spark"}}}""", fields))
    assert(!TextIndex.coverable("text:(a OR", fields))            // malformed → false
  }

  private val parity = Seq(
    "text:spark OR text:batch",
    "text:filt* AND lang:de",
    "text:(spark OR batch)^2 AND -lang:de",
    "text:spark AND text:stream*",
    "source:src1 AND (text:batch OR text:state)",
    "#options:load-rows=false#text:batch",
    // uncoverable → transparent scan fallback, still identical
    "NOT text:spark",
    "text:batc~1"
  )

  test("searchIndexed ≡ Search.search on every query shape") {
    val postings = TextIndex.buildPostings(docs, "doc_id", fields.toSeq, 8)
    for (q <- parity) {
      val scan = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      val indexed = TextIndex.searchIndexed(docs, postings, q, IndexConfig(),
        Seq("doc_id"), fields, 8)
      assert(indexed.columns.toSeq == scan.columns.toSeq, s"columns for: $q")
      val a = scan.collect().map(_.toSeq).toSet
      val b = indexed.collect().map(_.toSeq).toSet
      assert(a == b, s"result mismatch for: $q")
    }
  }

  test("written store: equality probe prunes partitions and pushes the token filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-postings").toString
    TextIndex.writePostings(
      TextIndex.buildPostings(docs, "doc_id", fields.toSeq, 16), dir)
    val store = spark.read.option("basePath", dir).parquet(dir)
    val cands = TextIndex.candidateIds(store,
      Set(TextIndex.EqProbe("text", "spark")), 16)
    val plan = cands.queryExecution.executedPlan.toString
    // directory-level pruning on the bucket partition column
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no partition filter in:\n$plan")
    // token equality pushed to parquet
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(token,spark)"),
      s"token filter not pushed in:\n$plan")
    assert(cands.as[Long].collect().toSet == Set(1L, 4L))
    // prefix probe: pushed StartsWith, correct supersets
    val pre = TextIndex.candidateIds(store,
      Set(TextIndex.PrefixProbe("text", "filt")), 16)
    assert(pre.queryExecution.executedPlan.toString.contains("StringStartsWith(token,filt)"))
    assert(pre.as[Long].collect().toSet == Set(2L, 3L))
  }

  test("append-only maintenance: new batch searchable; stale postings harmless") {
    val dir = java.nio.file.Files.createTempDirectory("graft-postings-inc").toString
    TextIndex.writePostings(
      TextIndex.buildPostings(docs, "doc_id", fields.toSeq, 8), dir)
    // doc 2 rewritten (loses 'filter', gains 'spark'), doc 7 new
    val updated = Seq(
      (2L, "batch jobs moved to spark", "en", "src2"),
      (7L, "fresh filter document", "en", "src9")
    ).toDF("doc_id", "text", "lang", "source")
    TextIndex.appendPostings(updated, "doc_id", fields.toSeq, dir, 8)
    val store = spark.read.option("basePath", dir).parquet(dir)
    val current = docs.where($"doc_id" =!= 2L)
      .unionByName(updated)
    // new docs found via appended postings
    val hits = TextIndex.searchIndexed(current, store, "text:filter",
      IndexConfig(), Seq("doc_id"), fields, 8)
    assert(hits.select("doc_id").as[Long].collect().toSet == Set(7L))
    // doc 2's stale 'filter' posting is a false candidate the verifier
    // dropped; its new 'spark' posting serves queries
    val sp = TextIndex.searchIndexed(current, store, "text:spark",
      IndexConfig(), Seq("doc_id"), fields, 8)
    assert(sp.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    // compaction dedups without changing answers
    val (before, after) = TextIndex.compactPostings(spark, dir)
    assert(after <= before)
    val store2 = spark.read.option("basePath", dir).parquet(dir)
    val sp2 = TextIndex.searchIndexed(current, store2, "text:spark",
      IndexConfig(), Seq("doc_id"), fields, 8)
    assert(sp2.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
  }
}
