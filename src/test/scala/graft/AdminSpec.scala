package graft

import org.scalatest.funsuite.AnyFunSuite

/** S9 admin dispatch + alias search. */
class AdminSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private def docs = Seq(("1", "spark batch", "en")).toDF("doc_id", "text", "lang")

  test("command recognition mirrors the reference protocol") {
    assert(AdminCommand.parse("#get_mapping#").contains(AdminCommand.GetMapping))
    assert(AdminCommand.parse("#truncate#").contains(AdminCommand.Truncate))
    assert(AdminCommand.parse("#put_mapping#{\"text\":{}}#")
      .contains(AdminCommand.PutMapping("{\"text\":{}}")))
    assert(AdminCommand.parse("#update#{\"max-results\":\"5\"}#")
      .contains(AdminCommand.UpdateSettings("{\"max-results\":\"5\"}")))
    // #options: is query metadata, not admin; plain queries pass through
    assert(AdminCommand.parse("#options:load-rows=false#x:y").isEmpty)
    assert(AdminCommand.parse("text:spark").isEmpty)
    // payload-less commands are not commands (and must not throw)
    assert(AdminCommand.parse("#put_mapping#").isEmpty)
    assert(AdminCommand.parse("#update#").isEmpty)
  }

  test("get_mapping returns schema rows; put_mapping reports field presence") {
    val (m, _) = Admin.execute(spark, docs, AdminCommand.GetMapping, IndexConfig())
    assert(m.count() == 3)
    val (p, _) = Admin.execute(spark, docs,
      AdminCommand.PutMapping("""{"text":{"type":"text"},"missing":{}}"""), IndexConfig())
    val presence = p.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(presence == Map("text" -> true, "missing" -> false))
  }

  test("update settings hot-reloads the config (M11)") {
    val (r, next) = Admin.execute(spark, docs,
      AdminCommand.UpdateSettings("""{"max-results":"77","segment":"day"}"""),
      IndexConfig())
    assert(r.count() == 1)
    assert(next.maxResults == 77)
    assert(next.segment == SegmentGranularity.Day)
  }

  test("truncate empties; malformed admin payloads degrade gracefully") {
    val (t, _) = Admin.execute(spark, docs, AdminCommand.Truncate, IndexConfig())
    assert(t.count() == 0)
    val (bad, cfg2) = Admin.execute(spark, docs,
      AdminCommand.UpdateSettings("{not json"), IndexConfig(maxResults = 123))
    assert(bad.count() == 1)
    assert(cfg2.maxResults == 10000) // empty options → defaults
  }

  test("alias search spans tables with differing schemas") {
    val other = Seq(("9", "batch pipelines", "fr", "extra"))
      .toDF("doc_id", "text", "lang", "source")
    val hits = Search.searchAlias(Seq(docs, other), "text:batch", IndexConfig())
    assert(hits.select("doc_id").collect().map(_.getString(0)).sorted.toSeq == Seq("1", "9"))
  }

  test("_transform analogs: pivot groups + metrics, latest per key") {
    val ev = Seq(
      ("u1", 1L, "a", 10.0), ("u1", 2L, "a", 30.0),
      ("u2", 3L, "b", 20.0), ("u2", 4L, "a", 40.0))
      .toDF("user", "seq", "kind", "v")
    val piv = Transform.pivot(ev,
      """{"group_by": {"k": {"terms": {"field": "kind"}}},
          "aggregations": {"n": {"value_count": {"field": "seq"}},
            "hi": {"max": {"field": "v"}}}}""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(piv == Set(("a", 3L, 40.0), ("b", 1L, 20.0)))
    val lat = Transform.latest(ev,
      """{"unique_key": ["user"], "sort": "seq"}""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(lat == Set(("u1", 2L), ("u2", 4L)))
    assert(intercept[IllegalArgumentException](Transform.pivot(ev,
      """{"group_by": {"k": {"terms": {"field": "kind"}}}}"""))
      .getMessage.contains("needs 'aggregations'"))
  }

  test("_sql endpoint: views, DSL filter under the table, fetch_size, gates") {
    val d = Seq((1L, "en", 10L), (2L, "en", 30L), (3L, "de", 50L), (4L, "fr", 70L))
      .toDF("doc_id", "lang", "n")
    val out = EsSql.run(spark, Map("idx" -> d),
      """{"query": "SELECT lang, count(*) AS c FROM idx GROUP BY lang ORDER BY lang",
          "filter": {"range": {"n": {"gte": 30}}}}""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("de", 1L), ("en", 1L), ("fr", 1L))) // doc 1 filtered out
    val capped = EsSql.run(spark, Map("idx" -> d),
      """{"query": "SELECT doc_id FROM idx ORDER BY doc_id", "fetch_size": 2}""")
      .collect().map(_.getLong(0)).toSeq
    assert(capped == Seq(1L, 2L))
    assert(intercept[IllegalArgumentException](EsSql.run(spark, Map("idx" -> d),
      """{"fetch_size": 2}""")).getMessage.contains("needs 'query'"))
    assert(intercept[IllegalArgumentException](EsSql.run(spark, Map("idx" -> d),
      """{"query": "SELECT 1", "cursor": "abc"}"""))
      .getMessage.contains("unsupported _sql option"))
  }

  test("search_shards ring: disjoint, complete, ends meet exactly") {
    val ring = Admin.searchShards(spark, 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ring.map(_._1).toSeq == (0 until 5))
    assert(ring.head._2 == Long.MinValue)
    assert(ring.last._3 == Long.MaxValue)
    // adjacent ranges meet with no gap and no overlap
    ring.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 + 1 == b._2, s"$a -> $b")
    }
    // ranges are non-empty and roughly even (within one token of 2^64/5)
    ring.foreach { case (_, s, e) => assert(e > s) }
    val one = Admin.searchShards(spark, 1).collect()
    assert(one.length == 1 && one(0).getLong(1) == Long.MinValue &&
      one(0).getLong(2) == Long.MaxValue)
  }
}
