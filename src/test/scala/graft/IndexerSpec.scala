package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-path behavior tests mirroring the reference's per-behavior unit
  * tests (empty-update skip ↔ EsSecondaryIndexTest.java:152-160, analytic
  * mode ↔ EsSecondaryIndex.java:413, upsert ↔ ElasticIndexTest.java:302-317). */
class IndexerSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val now = java.sql.Timestamp.from(java.time.Instant.parse("2024-07-01T00:00:00Z"))

  test("doc-id synthesis: composite PK+CK joined with '-'") {
    val df = Seq((1L, 2, "x")).toDF("pk", "ck", "v")
    val out = df.select(DocModel.docId(Seq("pk"), Seq("ck")).as("doc_id"))
    assert(out.head.getString(0) == "1-2")
  }

  test("doc-id separator is configurable (reference genesys-es-id-separator)") {
    val df = Seq((1L, 2, "x")).toDF("pk", "ck", "v")
    assert(df.select(DocModel.docId(Seq("pk"), Seq("ck"), sep = "::"))
      .head.getString(0) == "1::2")
  }

  test("doc-id synthesis: single bare PK") {
    val df = Seq(("42", "x")).toDF("id", "v")
    assert(df.select(DocModel.docId(Seq("id"))).head.getString(0) == "42")
  }

  test("doc projection stamps IndexationDate in ISO-8601 GMT") {
    val df = Seq((1L, "a")).toDF("id", "v")
    val out = DocModel.project(df, Seq("id"), Nil, IndexConfig(), now)
    assert(out.select("IndexationDate").head.getString(0) == "2024-07-01T00:00:00.000Z")
  }

  test("TTL column projects into _cassandraTtl (W10)") {
    val df = Seq((1L, "a", 12345L)).toDF("id", "v", "exp")
    val out = DocModel.project(df, Seq("id"), Nil, IndexConfig(), now,
      ttlCol = Some("exp"))
    assert(out.columns.toSeq == Seq("doc_id", "id", "v", "IndexationDate", "_cassandraTtl"))
    assert(out.select("_cassandraTtl").head.getLong(0) == 12345L)
  }

  test("last-write-wins upsert keeps the newest version per key") {
    val updates = Seq(
      ("k1", 1L, "old"), ("k1", 3L, "new"), ("k1", 2L, "mid"),
      ("k2", 1L, "only")).toDF("doc_id", "ver", "v")
    val out = Indexer.latestPerKey(updates, "doc_id", Seq("ver"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("k1", "new"), ("k2", "only")))
  }

  test("upsert: batch beats existing; insert-only is create-or-replace") {
    val existing = Seq(("k1", 0L, "orig"), ("k3", 0L, "keep")).toDF("doc_id", "ver", "v")
    val batch = Seq(("k1", 5L, "upd"), ("k2", 5L, "ins")).toDF("doc_id", "ver", "v")
    val upserted = Indexer.upsert(existing, batch, "doc_id", Seq("ver"))
      .orderBy("doc_id").collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(upserted == Seq(("k1", "upd"), ("k2", "ins"), ("k3", "keep")))
    // the ES `index` action creates-or-REPLACES (ElasticIndex.java:595-601):
    // the new write wins, same as the default path for full documents
    val insertOnly = Indexer.upsert(existing, batch, "doc_id", Seq("ver"),
        IndexConfig(insertOnly = true))
      .orderBy("doc_id").collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(insertOnly == Seq(("k1", "upd"), ("k2", "ins"), ("k3", "keep")))
  }

  test("upsert default path field-merges: null update fields keep existing values") {
    // ES `_update`+doc_as_upsert merge: with discard-nulls, a null field in
    // the update doc is "absent" — the existing value survives
    val existing = Seq(("k1", 0L, "origV", "origW")).toDF("doc_id", "ver", "v", "w")
    val batch = Seq(("k1", 5L, null.asInstanceOf[String], "newW")).toDF("doc_id", "ver", "v", "w")
    val merged = Indexer.upsert(existing, batch, "doc_id", Seq("ver")).collect()
    assert(merged.map(r => (r.getString(0), r.getString(2), r.getString(3))).toSeq ==
      Seq(("k1", "origV", "newW")))
    // discardNulls=false: nulls are explicit — whole-document replacement
    val replaced = Indexer.upsert(existing, batch, "doc_id", Seq("ver"),
      IndexConfig(discardNulls = false)).collect()
    assert(replaced.map(r => (r.getString(0), r.getString(2), r.getString(3))).toSeq ==
      Seq(("k1", null, "newW")))
  }

  test("dummy mode makes every sink a no-op; reads unaffected (M13)") {
    val docs = Seq(("k1", 1L, "orig")).toDF("doc_id", "ver", "v")
    val batch = Seq(("k1", 9L, "upd"), ("k2", 9L, "new")).toDF("doc_id", "ver", "v")
    val cfg = IndexConfig(dummy = true)
    assert(Indexer.upsert(docs, batch, "doc_id", Seq("ver"), cfg)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq == Seq(("k1", "orig")))
    assert(Indexer.delete(docs, batch.select("doc_id"), Seq("doc_id"), cfg).count() == 1)
    assert(OptionReader.toConfig(OptionReader.resolve(Map("dummy" -> "true"))).dummy)
  }

  test("delete removes by key; analytic mode suppresses deletes") {
    val docs = Seq(("a", 1), ("b", 2)).toDF("doc_id", "v")
    val dels = Seq("a").toDF("doc_id")
    assert(Indexer.delete(docs, dels, Seq("doc_id")).collect().map(_.getString(0)).toSeq == Seq("b"))
    assert(Indexer.delete(docs, dels, Seq("doc_id"),
      IndexConfig(analyticMode = true)).count() == 2)
  }

  test("empty-update skip drops all-null docs, keeps partial ones") {
    val df = Seq(
      (1, Option.empty[String], Option.empty[String]),
      (2, Some("x"), Option.empty[String])).toDF("id", "f1", "f2")
    val out = DocModel.skipEmpty(df, Seq("f1", "f2"))
    assert(out.select("id").collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("discard-nulls controls JSON null emission") {
    val df = Seq((Option.empty[String], 7L)).toDF("et", "uid")
    val both = df.select(
      DocModel.docJson(IndexConfig(discardNulls = true), col("et"), col("uid")).as("d"),
      DocModel.docJson(IndexConfig(discardNulls = false), col("et"), col("uid")).as("k"))
      .head
    assert(both.getString(0) == """{"uid":7}""")
    assert(both.getString(1) == """{"et":null,"uid":7}""")
  }

  test("json-flat-serialized-fields are flattened in the doc projection") {
    val df = Seq((1L, """{"a":{"x":1},"b":[2,3]}""")).toDF("id", "payload")
    val out = DocModel.project(df, Seq("id"), Nil,
      IndexConfig(jsonFlatSerializedFields = Set("payload"), indexationDate = false), now)
    val m = out.select("payload").head.getMap[String, scala.collection.Seq[String]](0)
    assert(m("a").toSeq == Seq("x=1") && m("b").toSeq == Seq("2", "3"))
  }

  test("json-serialized-fields: bad JSON fails strict, nulls with skip-bad-json") {
    val df = Seq((1L, """{"ok":1}"""), (2L, "{oops")).toDF("id", "payload")
    val skip = DocModel.project(df, Seq("id"), Nil,
      IndexConfig(jsonSerializedFields = Set("payload"), skipBadJson = true,
        indexationDate = false), now)
    assert(skip.where(col("payload").isNull).count() == 1)
    val strict = DocModel.project(df, Seq("id"), Nil,
      IndexConfig(jsonSerializedFields = Set("payload"), indexationDate = false), now)
    val err = intercept[Exception] { strict.collect() }
    assert(err.getMessage != null)
  }

  test("blob conversion emits size placeholder, not content") {
    val df = Seq(("abcd")).toDF("b").select(col("b").cast("binary").as("b"))
    val out = df.select(DocModel.convert("b", org.apache.spark.sql.types.BinaryType))
    assert(out.head.getString(0) == "4 bytes")
  }

  test("bulk NDJSON matches the reference upsert request shape (A5)") {
    val docs = Seq(("42", "hello")).toDF("doc_id", "Value")
    val upsert = Indexer.toBulkNdjson(docs, "testkeyspace_testtable_index@")
      .head.getString(1)
    assert(upsert ==
      "{\"update\":{\"_index\":\"testkeyspace_testtable_index@\",\"_id\":\"42\"}}\n" +
      "{\"doc\":{\"Value\":\"hello\"},\"doc_as_upsert\":true}")
    val insert = Indexer.toBulkNdjson(docs, "idx", IndexConfig(insertOnly = true))
      .head.getString(1)
    assert(insert == "{\"index\":{\"_index\":\"idx\",\"_id\":\"42\"}}\n{\"Value\":\"hello\"}")
  }

  test("exactlyOnce picks a deterministic winner among differing duplicates") {
    val replayed = Seq(
      ("u1", 1L, "corrected"), ("u1", 1L, "original"),
      ("u2", 2L, "only")).toDF("user", "mut_id", "payload")
    val out = Indexer.exactlyOnce(replayed, "user", "mut_id")
      .orderBy("user").collect().map(r => (r.getString(0), r.getString(2))).toSeq
    // fallback orders remaining columns descending: 'o' > 'c', so
    // "original" sorts first and wins deterministically
    assert(out == Seq(("u1", "original"), ("u2", "only")))
    // explicit version order wins over the fallback
    val versioned = Seq(("u1", 1L, 5L, "v5"), ("u1", 1L, 9L, "v9"))
      .toDF("user", "mut_id", "ver", "payload")
    val top = Indexer.exactlyOnce(versioned, "user", "mut_id", Seq("ver"))
      .head.getString(3)
    assert(top == "v9")
    // unorderable (map) columns are excluded from the fallback order and
    // never break the call
    val mapped = Seq(("u1", 1L, Map("a" -> 1), "x"), ("u1", 1L, Map("a" -> 2), "x"))
      .toDF("user", "mut_id", "m", "payload")
    assert(Indexer.exactlyOnce(mapped, "user", "mut_id").count() == 1)
  }

  test("buildDocs segments with CUSTOM fixed-width frames too") {
    val src = Seq(("1", "2024-03-05 10:30:00"), ("2", "2024-03-05 12:30:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val docs = Indexer.buildDocs(src, Seq("id"), Nil,
      IndexConfig(segment = SegmentGranularity.Fixed(3600000L), indexationDate = false),
      java.sql.Timestamp.valueOf("2024-07-01 00:00:00"), segmentSource = Some("ts"))
    assert(docs.columns.contains("segment"))
    assert(docs.select("segment").distinct().count() == 2) // 1h frames split them
  }

  test("fromBulkNdjson does not unwrap an index-action doc with a 'doc' field") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.StringType)))
    val docs = Seq(("1", "inner-value")).toDF("doc_id", "doc")
    val back = Indexer.fromBulkNdjson(
      Indexer.toBulkNdjson(docs, "idx", IndexConfig(insertOnly = true)).select("bulk"),
      schema).collect()
    assert(back.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "inner-value")))
  }

  test("bulk NDJSON round-trips through fromBulkNdjson (both action shapes)") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("Value",
        org.apache.spark.sql.types.StringType)))
    val docs = Seq(("42", "hello"), ("7", "with \"quotes\" and\nnewline"))
      .toDF("doc_id", "Value")
    for (cfg <- Seq(IndexConfig(), IndexConfig(insertOnly = true))) {
      val back = Indexer.fromBulkNdjson(
          Indexer.toBulkNdjson(docs, "idx", cfg).select("bulk"), schema)
        .orderBy("doc_id").collect().map(r => (r.getString(0), r.getString(1)))
      assert(back.toSeq == Seq(("42", "hello"), ("7", "with \"quotes\" and\nnewline")).sortBy(_._1))
    }
  }

  test("TTL filter honors shift and analytic mode") {
    val docs = Seq(("a", 100L), ("b", 200L), ("c", 0L)).toDF("doc_id", "_cassandraTtl")
    val kept = Maintain.ttlFilter(docs, nowEpochSec = 120, IndexConfig())
      .select("doc_id").collect().map(_.getString(0)).toSeq
    assert(kept == Seq("b"))
    val shifted = Maintain.ttlFilter(docs, nowEpochSec = 120, IndexConfig(ttlShiftSec = 100))
      .select("doc_id").collect().map(_.getString(0)).toSeq
    assert(shifted == Seq.empty)
    assert(Maintain.ttlFilter(docs, 120, IndexConfig(analyticMode = true)).count() == 3)
  }

  test("ingest pipeline shapes the batch and forces insert semantics (S4)") {
    val existing = Seq(("1", "KEEP", "old"), ("2", "DROP", "old"))
      .toDF("doc_id", "tag", "v")
    val updates = Seq(("2", "  New  ", null.asInstanceOf[String]),
      ("3", "Fresh", "x")).toDF("doc_id", "tag", "v")
    val cfg = IndexConfig(pipeline = Some(
      """{"processors":[{"trim":{"field":"tag"}},
                        {"lowercase":{"field":"tag"}},
                        {"set":{"field":"v","value":"filled","override":false}}]}"""))
    assert(cfg.usePipeline)
    val out = Indexer.upsert(existing, updates, "doc_id", Seq("doc_id"), cfg)
      .orderBy("doc_id").collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // doc 2: replaced wholesale (insert path, not field-merge) with the
    // pipeline-shaped row — trimmed+lowered tag, null v filled by set;
    // doc 3 arrives with v="x", so override:false leaves it alone
    assert(out.toSeq == Seq(("1", "KEEP", "old"), ("2", "new", "filled"), ("3", "fresh", "x")))
  }

  test("ingest processors: dissect, fingerprint, split/join, kv, date") {
    val df = Seq(("u1 GET /idx", "k1=a;k2=b", "2024-02-03", "x", "y"))
      .toDF("line", "props", "d", "f1", "f2")
    val t = IngestPipeline.compile(
      """{"processors":[
           {"dissect":{"field":"line","pattern":"%{user} %{verb} %{path}"}},
           {"fingerprint":{"fields":["f1","f2"],"target_field":"fp"}},
           {"split":{"field":"props","separator":";"}},
           {"join":{"field":"props","separator":","}},
           {"kv":{"field":"d","field_split":";","value_split":"=","target_field":"dm"}},
           {"date":{"field":"d","formats":["yyyy-MM-dd"],"target_field":"ts"}}]}""")
    val row = t(df).select("user", "verb", "path", "fp", "props", "ts").head
    assert(row.getString(0) == "u1" && row.getString(1) == "GET" &&
      row.getString(2) == "/idx")
    // sha1("x|y") — the ES default method over the joined field values
    assert(row.getString(3) ==
      java.security.MessageDigest.getInstance("SHA-1")
        .digest("x|y".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(row.getString(4) == "k1=a,k2=b")
    assert(row.getTimestamp(5).toString.startsWith("2024-02-03"))
    // dissect non-match yields nulls, not garbage
    val miss = IngestPipeline.compile(
      """{"processors":[{"dissect":{"field":"line","pattern":"%{a}::%{b}"}}]}""")(
      df).select("a", "b").head
    assert(miss.isNullAt(0) && miss.isNullAt(1))
  }

  test("ingest pipeline processors: rename, remove, gsub, convert; unknown rejected") {
    val df = Seq(("a", "src1", "41")).toDF("id", "origin", "n")
    val t = IngestPipeline.compile(
      """{"processors":[{"rename":{"field":"origin","target_field":"source"}},
                        {"gsub":{"field":"source","pattern":"^src","replacement":"s-"}},
                        {"convert":{"field":"n","type":"integer"}},
                        {"remove":{"field":"id"}}]}""")
    val out = t(df)
    assert(out.columns.toSeq == Seq("source", "n"))
    val row = out.head
    assert(row.getString(0) == "s-1" && row.getInt(1) == 41)
    // loud failures: unknown processor, missing keys, malformed JSON,
    // and a stringly-typed override (must be a real boolean)
    assert(IngestPipeline.validate("""{"processors":[{"nope":{"field":"x"}}]}""").isLeft)
    assert(IngestPipeline.validate("""{"processors":[{"set":{"field":"x"}}]}""").isLeft)
    assert(IngestPipeline.validate("""{"foo":1}""").isLeft)
    assert(IngestPipeline.validate(
      """{"processors":[{"set":{"field":"x","value":"v","override":"true"}}]}""").isLeft)
    // pipeline forces the index action on the bulk wire format too
    val bulk = Indexer.toBulkNdjson(Seq(("1", "v")).toDF("doc_id", "v"), "idx",
      IndexConfig(pipeline = Some("""{"processors":[]}""")))
    assert(bulk.head.getString(1).startsWith("""{"index":"""))
  }

  test("pipeline-<type> option resolves into the typed config (S4)") {
    val opts = OptionReader.resolve(Map(
      "pipeline-mytype" -> """{"processors":[]}""", "max-results" -> "7"))
    val cfg = OptionReader.toConfig(opts, typeName = "mytype")
    assert(cfg.usePipeline && cfg.maxResults == 7)
    assert(!OptionReader.toConfig(opts).usePipeline) // no bare `pipeline` key
    // bare key serves single-type stores
    assert(OptionReader.toConfig(OptionReader.resolve(
      Map("pipeline" -> """{"processors":[]}"""))).usePipeline)
  }

  test("segment roll assigns date_trunc buckets; truncate empties") {
    val df = Seq(("2024-03-05 10:30:00", 1), ("2024-03-07 00:00:00", 2))
      .toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val seg = df.withColumn("s", Maintain.segmentOf(col("ts"), SegmentGranularity.Month))
    assert(seg.select("s").distinct().count() == 1)
    // CUSTOM fixed-width frames: 1h buckets split 10:30 from 11:30, not 10:59
    val fixed = df.where(col("v") === 1)
      .withColumn("ts2", expr("ts + INTERVAL 29 MINUTES"))
      .select(
        Maintain.segmentOf(col("ts"), SegmentGranularity.Fixed(3600000L)).as("a"),
        Maintain.segmentOf(col("ts2"), SegmentGranularity.Fixed(3600000L)).as("b"))
      .head
    assert(fixed.getTimestamp(0) == fixed.getTimestamp(1)) // 10:30 and 10:59 share the frame
    assert(Maintain.truncate(df).count() == 0)
  }

  test("delete_by_query: matching docs drop, null-predicate docs survive") {
    val docs = Seq(("1", "de", 10L), ("2", "fr", 20L),
      ("3", null.asInstanceOf[String], 30L)).toDF("doc_id", "lang", "views")
    val out = Indexer.deleteByQuery(docs,
      """{"query": {"term": {"lang": "de"}}}""")
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(out == Set("2", "3")) // null lang did not match -> survives
    // analytic mode: deletes are a no-op (documents outlive source rows)
    assert(Indexer.deleteByQuery(docs, """{"query": {"term": {"lang": "de"}}}""",
      cfg = IndexConfig(analyticMode = true)).count() == 3)
  }

  test("update_by_query: one-projection SET against the original row") {
    val docs = Seq(("1", "de", 10.0), ("2", "fr", 20.0))
      .toDF("doc_id", "lang", "score")
    val out = Indexer.updateByQuery(docs,
      """{"query": {"term": {"lang": "de"}}}""",
      Map("score" -> (col("score") * 2), "lang" -> upper(col("lang"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(("1", "DE", 20.0), ("2", "fr", 20.0)))
    // loud: id reassignment, unknown target column
    assert(intercept[IllegalArgumentException](Indexer.updateByQuery(docs,
      """{"query": {"match_all": {}}}""", Map("doc_id" -> lit("x"))))
      .getMessage.contains("id column"))
    assert(intercept[IllegalArgumentException](Indexer.updateByQuery(docs,
      """{"query": {"match_all": {}}}""", Map("nope" -> lit(1))))
      .getMessage.contains("not a column"))
  }

  test("upsertVersioned external: only strictly-higher versions apply") {
    val store = Seq(("a", 5L, "old-a"), ("b", 5L, "old-b"))
      .toDF("doc_id", "ver", "val")
    val batch = Seq(("a", 7L, "new-a"),   // higher → applies
                    ("b", 5L, "stale-b"), // equal → conflict, drops
                    ("c", 1L, "new-c"))   // absent → applies
      .toDF("doc_id", "ver", "val")
    val out = Indexer.upsertVersioned(store, batch, "doc_id", "ver")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(("a", 7L, "new-a"), ("b", 5L, "old-b"), ("c", 1L, "new-c")))
  }

  test("upsertVersioned cas: exact seq match applies and bumps; miss keeps") {
    val store = Seq(("a", 3L, "old-a"), ("b", 3L, "old-b"))
      .toDF("doc_id", "seq", "val")
    val batch = Seq(("a", 3L, "new-a"),   // matches → applies, seq bumps
                    ("b", 2L, "racy-b"),  // stale seq → 409-drop
                    ("c", 0L, "new-c"))   // absent doc → no seq to match
      .toDF("doc_id", "seq", "val")
    val out = Indexer.upsertVersioned(store, batch, "doc_id", "seq", "cas")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(("a", 4L, "new-a"), ("b", 3L, "old-b")))
    assert(intercept[IllegalArgumentException](
      Indexer.upsertVersioned(store, batch, "doc_id", "seq", "nope"))
      .getMessage.contains("mode"))
  }

  test("scriptedUpsert: counter increments, defaults seed fresh keys, " +
       "unscripted columns field-merge") {
    val store = Seq(("a", 10L, "t-a"), ("b", 20L, "t-b"))
      .toDF("doc_id", "cnt", "tag")
    val batch = Seq(("a", 3L), ("c", 5L)).toDF("doc_id", "cnt")
    val out = Indexer.scriptedUpsert(store, batch, "doc_id",
        scripts = Map("cnt" -> "ctx.cnt + params.cnt"),
        upsertDefaults = Map("cnt" -> 0L))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == Set(
      ("a", 13L, Some("t-a")),  // scripted: 10 + 3; tag kept
      ("b", 20L, Some("t-b")),  // no update row → untouched
      ("c", 5L, None)))         // fresh: default 0 + 5; tag default null
    assert(intercept[IllegalArgumentException](
      Indexer.scriptedUpsert(store, batch, "doc_id",
        scripts = Map("nope" -> "1"))).getMessage.contains("not in the store"))
  }

  test("scriptedUpsert: duplicate batch keys fold sequentially (ES bulk " +
       "order), never fan out or last-write-win") {
    val store = Seq(("a", 10L, "t-a")).toDF("doc_id", "cnt", "tag")
    // three ops for "a" (one stored), two for "c" (fresh): a counter batch
    // must accumulate every op — ES applies bulk updates one at a time
    val batch = Seq(("a", 1, 3L), ("a", 2, 4L), ("a", 3, 5L),
                    ("c", 1, 7L), ("c", 2, 2L)).toDF("doc_id", "seq", "cnt")
    val out = Indexer.scriptedUpsert(store, batch, "doc_id",
        scripts = Map("cnt" -> "ctx.cnt + params.cnt"),
        upsertDefaults = Map("cnt" -> 0L),
        orderCols = Seq("seq"))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    // one row per key (store invariant), all ops applied
    assert(out == Set(
      ("a", 22L, Some("t-a")),  // 10 +3 +4 +5
      ("c", 9L, None)))         // 0 +7 +2
    // non-commutative script: order matters, orderCols pins it
    val store2 = Seq(("k", 10L, "t")).toDF("doc_id", "cnt", "tag")
    val b2 = Seq(("k", 1, 5L), ("k", 2, 3L)).toDF("doc_id", "seq", "cnt")
    val doubled = Indexer.scriptedUpsert(store2, b2, "doc_id",
        scripts = Map("cnt" -> "ctx.cnt * 2 - params.cnt"),
        orderCols = Seq("seq"))
      .collect().map(r => r.getLong(1)).toSeq
    assert(doubled == Seq((10L * 2 - 5) * 2 - 3)) // 15 → 27, not 17
    assert(intercept[IllegalArgumentException](
      Indexer.scriptedUpsert(store2, b2, "doc_id",
        scripts = Map("cnt" -> "ctx.cnt"), orderCols = Seq("nope")))
      .getMessage.contains("not in the batch"))
  }

  test("scriptedUpsert: a map-typed batch column rides along as a param " +
       "without keying the sort (documented usage, duplicate keys included)") {
    val store = Seq(("a", 10L, "t-a")).toDF("doc_id", "cnt", "tag")
    // `meta` is map-typed — non-orderable, so it must NOT participate in
    // the per-key op ordering; `seq` keys the fold
    val batch = Seq(("a", 1, 3L, Map("src" -> "x")),
                    ("a", 2, 4L, Map("src" -> "y")),
                    ("c", 1, 7L, Map.empty[String, String]))
      .toDF("doc_id", "seq", "cnt", "meta")
    val out = Indexer.scriptedUpsert(store, batch, "doc_id",
        scripts = Map("cnt" -> "ctx.cnt + params.cnt"),
        upsertDefaults = Map("cnt" -> 0L),
        orderCols = Seq("seq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 17L), ("c", 7L)))
  }
}
