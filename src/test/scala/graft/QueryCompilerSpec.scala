package graft

import org.apache.spark.sql.functions.{col, expr, lit, struct}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-parser tests mirroring the reference's fixtures:
  * QueryMetaDataTest.java:26-57 (option prefix) and the validation state
  * machine in ElasticIndexTest.java:222-300 (here: eager compile errors). */
class QueryCompilerSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark

  // --- QueryMeta (reference: QueryMetaDataTest.java:26-57) ---

  test("option prefix with load-rows=false") {
    val m = QueryMeta.parse("#options:load-rows=false#plop=42")
    assert(m.query == "plop=42")
    assert(!m.loadRows)
  }

  test("trailing hashes belong to the query") {
    val m = QueryMeta.parse("#options:load-rows=true,number=42#plop=42###")
    assert(m.query == "plop=42###")
    assert(m.loadRows)
    assert(m.options("number") == "42")
  }

  test("option values use Boolean.valueOf semantics, case-insensitive") {
    // reference parses with Boolean.valueOf: any case of "false" — or any
    // non-"true" value — disables (QueryMetaData.java:64-75)
    assert(!QueryMeta.parse("#options:load-rows=FALSE#x:y").loadRows)
    assert(!QueryMeta.parse("#options:load-rows=False#x:y").loadRows)
    assert(!QueryMeta.parse("#options:load-rows=nope#x:y").loadRows)
    assert(QueryMeta.parse("#options:load-rows=TRUE#x:y").loadRows)
    assert(QueryMeta.parse("#options:load-source=TRUE#x:y").loadSource)
    assert(!QueryMeta.parse("#options:load-source=FALSE#x:y").loadSource)
  }

  test("no prefix passes through unchanged") {
    val m = QueryMeta.parse("body:cassan*")
    assert(m.query == "body:cassan*")
    assert(m.loadRows)
    assert(!m.loadSource) // reference default: load-source=false when absent
    assert(QueryMeta.parse("#options:load-source=true#x:y").loadSource)
  }

  test("DSL long-form bodies compile; empty/typed-wrong bodies are rejected") {
    // the long object form ES clients emit — query/value key per operator
    assert(QueryCompiler.validate(
      """{"query":{"match":{"text":{"query":"spark"}}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"match":{"text":{"query":"spark","boost":2}}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"term":{"lang":{"value":"en"}}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"wildcard":{"text":{"value":"filt*"}}}}""").isRight)
    // wrong value key for the operator
    assert(QueryCompiler.validate(
      """{"query":{"match":{"text":{"value":"spark"}}}}""").isLeft)
    // match `operator` is supported (r6); still-unknown sub-keys must be
    // rejected, not silently dropped
    assert(QueryCompiler.validate(
      """{"query":{"match":{"text":{"query":"x","operator":"and"}}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"match":{"text":{"query":"x","analyzer":"english"}}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"match":{"text":{"query":"x","boost":0}}}}""").isLeft)
    assert(QueryCompiler.validate("""{"query":{"match":{"text":""}}}""").isLeft)
    assert(QueryCompiler.validate("""{"query":{"prefix":{"text":42}}}""").isLeft)
  }

  test("long-form boost weights the leaf score") {
    val q = QueryCompiler.compile(
      """{"query":{"bool":{"must":[{"match":{"text":{"query":"spark","boost":3}}}]}}}""")
    // the score expression must carry the 3-weighted leaf
    assert(q.score.toString.contains("3"))
  }

  // --- Lucene-lite grammar ---

  test("simple term compiles") {
    assert(QueryCompiler.validate("body:cassandra").isRight)
  }

  test("boolean operators and parens") {
    assert(QueryCompiler.validate("a:x AND (b:y OR NOT c:z)").isRight)
  }

  test("range syntax") {
    assert(QueryCompiler.validate("userid:[10 TO 50]").isRight)
    assert(QueryCompiler.validate("userid:{10 TO *}").isRight)
  }

  test("wildcards") {
    assert(QueryCompiler.validate("body:cassan*").isRight)
    assert(QueryCompiler.validate("body:*andra").isRight)
  }

  test("phrase terms keep inner spaces") {
    assert(QueryCompiler.validate("body:\"exact phrase here\"").isRight)
    assert(QueryCompiler.validate("a:\"p q\" AND b:x").isRight)
    assert(QueryCompiler.validate("body:\"unclosed").isLeft)
  }

  test("syntax errors are Left, never thrown") {
    assert(QueryCompiler.validate("a:x AND (").isLeft)
    assert(QueryCompiler.validate(":nofield").isLeft)
    assert(QueryCompiler.validate("").isLeft)
  }

  // --- ES-DSL JSON subset ---

  test("DSL term/range/bool compile") {
    assert(QueryCompiler.validate("""{"query":{"term":{"f":"v"}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"range":{"x":{"gte":1,"lt":5}}},"size":7}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"bool":{"must":[{"term":{"a":"b"}}],
         "must_not":[{"term":{"c":"d"}}],"should":[{"exists":{"field":"e"}}]}}}""").isRight)
  }

  test("DSL size is honored") {
    val q = QueryCompiler.compile("""{"query":{"match_all":{}},"size":7}""")
    assert(q.limit.contains(7))
  }

  test("DSL errors are Left") {
    assert(QueryCompiler.validate("""{"query":{"bogus":{}}}""").isLeft)
    assert(QueryCompiler.validate("""{no json""").isLeft)
    assert(QueryCompiler.validate("""{"size":5}""").isLeft) // missing query
  }

  test("query_string nests Lucene-lite inside DSL") {
    assert(QueryCompiler.validate(
      """{"query":{"query_string":{"query":"a:x AND b:y"}}}""").isRight)
  }

  test("DSL terms / ids / match_phrase compile; empty ids rejected") {
    assert(QueryCompiler.validate("""{"query":{"terms":{"f":["a","b"]}}}""").isRight)
    // [] is legal terms (matches nothing — ES parity; what a terms LOOKUP
    // on a missing doc resolves to); a non-array is still rejected
    assert(QueryCompiler.validate("""{"query":{"terms":{"f":[]}}}""").isRight)
    assert(QueryCompiler.validate("""{"query":{"terms":{"f":"x"}}}""").isLeft)
    assert(QueryCompiler.validate("""{"query":{"ids":{"values":["1","2"]}}}""").isRight)
    assert(QueryCompiler.validate("""{"query":{"ids":{}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"match_phrase":{"text":"exact phrase"}}}""").isRight)
    assert(QueryCompiler.validate("""{"query":{"match_phrase":{"text":""}}}""").isLeft)
  }

  test("span queries: span_term, span_near order/slop, span_first position cap") {
    import spark.implicits._
    val docs = Seq(
      ("1", "spark fast window join"), ("2", "window one two three spark"),
      ("3", "the spark window"), ("4", "spark alone here"))
      .toDF("doc_id", "text")
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    // ordered: spark ... window with <= 1 intervening token
    assert(ids("""{"query": {"span_near": {"clauses": [
        {"span_term": {"text": "spark"}}, {"span_term": {"text": "window"}}],
      "slop": 1, "in_order": true}}}""") == Set("1", "3"))
    // unordered widens to doc 2's window..spark only at slop >= 3
    assert(ids("""{"query": {"span_near": {"clauses": [
        {"span_term": {"text": "spark"}}, {"span_term": {"text": "window"}}],
      "slop": 3, "in_order": false}}}""") == Set("1", "2", "3"))
    // span_first: 'spark' must end within the first 2 positions
    assert(ids("""{"query": {"span_first": {"match":
        {"span_term": {"text": "spark"}}, "end": 2}}}""") == Set("1", "3", "4"))
    assert(ids("""{"query": {"span_first": {"match":
        {"span_term": {"text": "spark"}}, "end": 1}}}""") == Set("1", "4"))
    // mixed fields and nested spans fail loud
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"span_near": {"clauses": [
          {"span_term": {"text": "a"}}, {"span_term": {"doc_id": "b"}}],
        "slop": 0}}}""")).getMessage.contains("share one field"))
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"span_near": {"clauses": [
          {"span_near": {"clauses": []}}, {"span_term": {"text": "b"}}],
        "slop": 0}}}""")).getMessage.contains("span_term"))
  }

  test("span_or unions span clauses; span_not excludes ordered context") {
    import spark.implicits._
    val docs = Seq(
      ("1", "jakarta apache tomcat"), ("2", "jakarta island in indonesia"),
      ("3", "apache spark engine"), ("4", "big jakarta apache project"))
      .toDF("doc_id", "text")
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    // span_or: either term's spans
    assert(ids("""{"query": {"span_or": {"clauses": [
        {"span_term": {"text": "tomcat"}},
        {"span_term": {"text": "island"}}]}}}""") == Set("1", "2"))
    // span_or accepts compound span clauses
    assert(ids("""{"query": {"span_or": {"clauses": [
        {"span_near": {"clauses": [{"span_term": {"text": "jakarta"}},
          {"span_term": {"text": "apache"}}], "slop": 0, "in_order": true}},
        {"span_term": {"text": "spark"}}]}}}""") == Set("1", "3", "4"))
    // span_not: 'jakarta' NOT followed by 'apache' — doc 2 only
    assert(ids("""{"query": {"span_not": {
        "include": {"span_term": {"text": "jakarta"}},
        "exclude": {"span_near": {"clauses": [
          {"span_term": {"text": "jakarta"}}, {"span_term": {"text": "apache"}}],
          "slop": 0, "in_order": true}}}}}""") == Set("2"))
    // span_not reversed: 'apache' NOT preceded by 'jakarta' — doc 3 only
    assert(ids("""{"query": {"span_not": {
        "include": {"span_term": {"text": "apache"}},
        "exclude": {"span_near": {"clauses": [
          {"span_term": {"text": "jakarta"}}, {"span_term": {"text": "apache"}}],
          "slop": 0, "in_order": true}}}}}""") == Set("3"))
    // exclude must contain the include term
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"span_not": {
          "include": {"span_term": {"text": "spark"}},
          "exclude": {"span_near": {"clauses": [
            {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
            "slop": 0, "in_order": true}}}}}"""))
      .getMessage.contains("include term"))
    // non-span clause inside span_or fails loud
    assert(QueryCompiler.validate(
      """{"query":{"span_or":{"clauses":[{"term":{"f":"v"}}]}}}""").isLeft)
  }

  test("wrapper decodes base64 and compiles the inner query") {
    import spark.implicits._
    val docs = Seq(("1", "alpha beta"), ("2", "gamma delta"))
      .toDF("doc_id", "text")
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    val b64 = java.util.Base64.getEncoder.encodeToString(
      """{"match": {"text": "gamma"}}""".getBytes("UTF-8"))
    assert(ids(s"""{"query": {"wrapper": {"query": "$b64"}}}""") == Set("2"))
    // invalid base64 and non-JSON payloads are loud, not silent
    assert(QueryCompiler.validate(
      """{"query":{"wrapper":{"query":"!!notb64!!"}}}""").isLeft)
    val junk = java.util.Base64.getEncoder.encodeToString("not json".getBytes("UTF-8"))
    assert(QueryCompiler.validate(
      s"""{"query":{"wrapper":{"query":"$junk"}}}""").isLeft)
  }

  test("terms_set matches per-doc minimums; literal form; loud errors") {
    import spark.implicits._
    val docs = Seq(
      ("1", "java scala spark", 2), ("2", "java alone", 2),
      ("3", "java scala", 3), ("4", "python", 1))
      .toDF("doc_id", "text", "required")
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    // per-doc field threshold: doc 1 matches 3>=2; doc 2 matches 1<2 no;
    // doc 3 matches 2<3 no; doc 4 matches 0
    assert(ids("""{"query": {"terms_set": {"text": {
        "terms": ["java", "scala", "spark"],
        "minimum_should_match_field": "required"}}}}""") == Set("1"))
    // literal threshold
    assert(ids("""{"query": {"terms_set": {"text": {
        "terms": ["java", "scala", "spark"],
        "minimum_should_match": 2}}}}""") == Set("1", "3"))
    // both / neither threshold forms are loud
    assert(QueryCompiler.validate("""{"query":{"terms_set":{"text":{
      "terms":["a"],"minimum_should_match":1,
      "minimum_should_match_field":"required"}}}}""").isLeft)
    assert(QueryCompiler.validate("""{"query":{"terms_set":{"text":{
      "terms":["a"]}}}}""").isLeft)
    assert(QueryCompiler.validate("""{"query":{"terms_set":{"text":{
      "terms":["a"],"minimum_should_match_script":{"source":"x"}}}}}""").isLeft)
  }

  test("pinned ranks promoted ids above organic, in the given order") {
    import spark.implicits._
    val docs = Seq(
      ("1", "relevant relevant relevant"), ("2", "relevant"),
      ("3", "nothing here"), ("4", "other"))
      .toDF("doc_id", "text")
    val hits = Search.search(docs,
      """{"query": {"pinned": {"ids": ["4", "3"],
          "organic": {"match": {"text": "relevant"}}}}}""",
      IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSeq
    // pinned 4 then 3 (given order), then organic by score: 1 (x3), 2 (x1)
    assert(hits == Seq("4", "3", "1", "2"))
    assert(QueryCompiler.validate(
      """{"query":{"pinned":{"ids":[],"organic":{"match_all":{}}}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"pinned":{"ids":["1"]}}}""").isLeft)
  }

  test("combined_fields matches terms across fields; operator and boosts") {
    import spark.implicits._
    val docs = Seq(
      ("1", "alpha", "beta"), ("2", "alpha", "gamma"),
      ("3", "delta", "beta"), ("4", "delta", "gamma"))
      .toDF("doc_id", "title", "body")
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    // or: either term in either field
    assert(ids("""{"query": {"combined_fields": {
        "query": "alpha beta", "fields": ["title", "body"]}}}""")
      == Set("1", "2", "3"))
    // and: both terms, each in SOME field
    assert(ids("""{"query": {"combined_fields": {
        "query": "alpha beta", "fields": ["title", "body"],
        "operator": "and"}}}""") == Set("1"))
    // per-field boosts are rejected (term-centric scoring)
    assert(QueryCompiler.validate("""{"query":{"combined_fields":{
      "query":"x","fields":["title^3"]}}}""").isLeft)
  }

  test("bool minimum_should_match compiles for integer thresholds") {
    assert(QueryCompiler.validate(
      """{"query":{"bool":{"should":[{"term":{"a":"x"}},{"term":{"b":"y"}},
         {"term":{"c":"z"}}],"minimum_should_match":2}}}""").isRight)
    // percentage forms are supported (r6); combination forms would
    // silently mis-count and must stay rejected
    assert(QueryCompiler.validate(
      """{"query":{"bool":{"should":[{"term":{"a":"x"}}],
         "minimum_should_match":"75%"}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"bool":{"should":[{"term":{"a":"x"}}],
         "minimum_should_match":"3<90%"}}}""").isLeft)
  }

  test("boost composes with ranges, not just terms") {
    assert(QueryCompiler.validate("a:[1 TO 5]^2").isRight)
    assert(QueryCompiler.validate("a:x^3 AND b:{1 TO *}^2").isRight)
  }

  // --- field grouping, ?, +/- (round-3 grammar extensions) ---

  test("field grouping distributes the field over bare terms") {
    assert(QueryCompiler.validate("text:(spark OR batch)").isRight)
    assert(QueryCompiler.validate("text:(a AND b OR c)").isRight)
    assert(QueryCompiler.validate("text:(a (b OR c))").isRight) // nested group
    assert(QueryCompiler.validate("text:(a OR b:x)").isRight)   // explicit field inside
    assert(QueryCompiler.validate("text:(a OR").isLeft)         // unclosed
  }

  test("group boost distributes over positive leaves") {
    val q = QueryCompiler.compile("text:(spark OR batch)^4")
    assert(q.score.toString.contains("4"))
  }

  test("group members keep their own suffixes (boost, fuzzy, wildcard, phrase)") {
    assert(QueryCompiler.validate("text:(spark^2 OR batc*)").isRight)
    assert(QueryCompiler.validate("text:(sprak~1 OR batch)").isRight)
    assert(QueryCompiler.validate("text:(\"exact phrase\" OR other)").isRight)
    assert(QueryCompiler.validate("v:([1 TO 5] OR {9 TO *})").isRight)
  }

  test("bare terms outside a group still require a field") {
    assert(QueryCompiler.validate("sparkle").isLeft)
    assert(QueryCompiler.validate("a:x OR sparkle").isLeft)
  }

  test("? single-char wildcard compiles; mixed with *") {
    assert(QueryCompiler.validate("text:te?t").isRight)
    assert(QueryCompiler.validate("text:fi?t*").isRight)
    assert(QueryCompiler.validate("""{"query":{"wildcard":{"text":"te?t"}}}""").isRight)
  }

  test("+required / -prohibited operators") {
    assert(QueryCompiler.validate("+text:spark -lang:de").isRight)
    assert(QueryCompiler.validate("-text:(a OR b) +c:d").isRight)
    assert(QueryCompiler.validate("- (a:x OR b:y)").isRight) // bare - before group
    // `-t` must compile to a negation: no positive leaves → zero score
    val q = QueryCompiler.compile("-text:spark")
    assert(q.score.toString == "0")
  }

  test("round-4 DSL operators compile; malformed bodies are rejected") {
    // multi_match: per-field boosts, most_fields scoring
    assert(QueryCompiler.validate(
      """{"query":{"multi_match":{"query":"x","fields":["a","b^2"]}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"multi_match":{"query":"x"}}}""").isLeft)     // no fields
    assert(QueryCompiler.validate(
      """{"query":{"multi_match":{"query":"x","fields":[]}}}""").isLeft)
    assert(QueryCompiler.validate(                               // unknown type
      """{"query":{"multi_match":{"query":"x","fields":["a"],"type":"nope_fields"}}}""").isLeft)
    // regexp: compile-time pattern validation, long form with boost
    assert(QueryCompiler.validate("""{"query":{"regexp":{"f":"src[0-9]+"}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"regexp":{"f":{"value":"a+","boost":2}}}}""").isRight)
    assert(QueryCompiler.validate("""{"query":{"regexp":{"f":"src["}}}""").isLeft)
    // malformed field boosts are loud, not silent unresolved columns
    assert(QueryCompiler.validate(
      """{"query":{"multi_match":{"query":"x","fields":["text^"]}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"multi_match":{"query":"x","fields":["text^2.5"]}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"multi_match":{"query":"x","fields":["^2"]}}}""").isLeft)
    // constant_score: boost rides the filter; inner clauses never score
    assert(QueryCompiler.validate(
      """{"query":{"constant_score":{"filter":{"term":{"f":"x"}},"boost":3}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"constant_score":{"boost":3}}}""").isLeft)    // no filter
    val cs = QueryCompiler.compile(
      """{"query":{"constant_score":{"filter":{"term":{"f":"x"}},"boost":3}}}""")
    assert(cs.score.toString.contains("3"))
    // match_phrase_prefix
    assert(QueryCompiler.validate(
      """{"query":{"match_phrase_prefix":{"f":"quick bro"}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"match_phrase_prefix":{"f":{"query":"a b","boost":2}}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"match_phrase_prefix":{"f":""}}}""").isLeft)
  }

  test("_exists_:field syntax compiles to field presence; NOT flips it") {
    assert(QueryCompiler.validate("_exists_:lang").isRight)
    assert(QueryCompiler.validate("NOT _exists_:lang AND text:spark").isRight)
    assert(QueryCompiler.validate("_exists_:lang^3").isRight)
    assert(QueryCompiler.validate("_exists_:").isLeft) // no target field
    val q = QueryCompiler.compile("_exists_:lang^3")
    assert(q.predicate.toString.contains("isnotnull") ||
      q.predicate.toString.contains("NOT (lang IS NULL)") ||
      q.predicate.toString.contains("isNotNull"))
    assert(q.score.toString.contains("3"))
  }

  test("Lucene /regex/ syntax: whole-token, boostable, validated eagerly") {
    assert(QueryCompiler.validate("source:/src[0-9]+/").isRight)
    assert(QueryCompiler.validate("source:/src[0-9]+/^2 AND text:spark").isRight)
    assert(QueryCompiler.validate("text:(/a[bc]/ OR plain)").isRight) // group-bound
    assert(QueryCompiler.validate("source:/src[/").isLeft)            // bad pattern
    assert(QueryCompiler.validate("source://").isLeft)                // empty pattern
    val q = QueryCompiler.compile("source:/src[0-9]+/^2")
    assert(q.score.toString.contains("2"))
  }

  // --- quoting and escaping inside groups (round-4 parser hardening) ---

  test("bare phrase with a colon inside a group is a value, not a field") {
    // `"a:b"` must bind to the group field; previously parsed field `"a`
    assert(QueryCompiler.validate("""text:("a:b" OR c)""").isRight)
    assert(QueryCompiler.validate("""text:("a:b c:d")""").isRight)
    // outside a group there is no default field to bind to → loud error
    assert(QueryCompiler.validate(""""a:b"""").isLeft)
  }

  test("parens inside quoted phrases don't close the group") {
    assert(QueryCompiler.validate("""text:("a)" OR b)""").isRight)
    assert(QueryCompiler.validate("""text:("(a" OR b)""").isRight)
    // both group terms must survive as scoring leaves
    val q = QueryCompiler.compile("""text:("a)" OR b)^3""")
    assert(q.score.toString.contains("3"))
    // a genuinely unclosed phrase is still a loud error
    assert(QueryCompiler.validate("""text:("a) OR b)""").isLeft)
  }

  test("escaped specials inside grouped terms stay literal") {
    assert(QueryCompiler.validate("""text:(a\-b OR c\*)""").isRight)
    assert(QueryCompiler.validate("""text:(a\-b OR c\*)^2""").isRight)
    // escaped wildcard is not a wildcard: both compile as plain terms and
    // both score (2 leaves, boost 2 distributes)
    val q = QueryCompiler.compile("""text:(a\-b OR c\*)^2""")
    assert(q.score.toString.contains("2"))
    // escaped caret/tilde inside a group keep boost/fuzzy parsing intact
    assert(QueryCompiler.validate("""text:(c\^2^5 OR d\~x)""").isRight)
  }

  test("query_string default_field binds bare terms (ES q= style)") {
    // bare terms without a default field stay a loud error
    assert(QueryCompiler.validate(
      """{"query":{"query_string":{"query":"spark batch"}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"query_string":{"query":"spark batch","default_field":"text"}}}""").isRight)
    // explicit field:term still wins over the default; mixed works
    assert(QueryCompiler.validate(
      """{"query":{"query_string":{"query":"spark AND lang:de","default_field":"text"}}}""").isRight)
    // unknown options and empty default_field rejected
    assert(QueryCompiler.validate(
      """{"query":{"query_string":{"query":"x","default_field":""}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"query_string":{"query":"x","analyzer":"std"}}}""").isLeft)
  }

  test("phrase proximity parses; slop is required and composes with boost") {
    assert(QueryCompiler.validate("""text:"spark batch"~3""").isRight)
    assert(QueryCompiler.validate("""text:"spark batch"~3^2""").isRight)
    assert(QueryCompiler.validate("""text:("spark batch"~2 OR other)""").isRight)
    // bare ~ on a phrase is NOT a default-2 fuzzy — explicit slop only
    assert(QueryCompiler.validate("""text:"spark batch"~""").isLeft)
    // fuzzy ranges stay rejected
    assert(QueryCompiler.validate("""num:[1 TO 2]~2""").isLeft)
    // DSL: match_phrase slop option; negative slop rejected
    assert(QueryCompiler.validate(
      """{"query":{"match_phrase":{"text":{"query":"a b","slop":2}}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"match_phrase":{"text":{"query":"a b","slop":-1}}}}""").isLeft)
    // slop is match_phrase-only — match still rejects it
    assert(QueryCompiler.validate(
      """{"query":{"match":{"text":{"query":"a","slop":2}}}}""").isLeft)
  }

  test("fuzzy fuzziness AUTO and prefix_length validate; junk is loud") {
    assert(QueryCompiler.validate(
      """{"query":{"fuzzy":{"text":{"value":"spark","fuzziness":"AUTO"}}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"fuzzy":{"text":{"value":"spark","fuzziness":"AUTO",
           "prefix_length":2}}}}""").isRight)
    // AUTO bands: a 2-char term gets edit budget 0 — still compiles
    assert(QueryCompiler.validate(
      """{"query":{"fuzzy":{"text":{"value":"ab","fuzziness":"AUTO"}}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"fuzzy":{"text":{"value":"spark","fuzziness":"SORTA"}}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"fuzzy":{"text":{"value":"spark","prefix_length":-1}}}}""").isLeft)
    // the AUTO band function itself
    import graft.functions.TextSketchFunctions.autoFuzziness
    assert(autoFuzziness("ab") == 0 && autoFuzziness("abc") == 1 &&
      autoFuzziness("abcde") == 1 && autoFuzziness("abcdef") == 2)
  }

  test("default_operator=OR: adjacency is OR with Lucene occur-flag semantics") {
    import QueryCompiler.LuceneLite
    import QueryCompiler.LuceneLite._
    def t(v: String) = Term("text", v)
    // bare adjacency: OR under the OR default, AND under the AND default
    assert(LuceneLite.ast("text:a text:b", defaultOr = true) == Or(t("a"), t("b")))
    assert(LuceneLite.ast("text:a text:b") == And(t("a"), t("b")))
    // explicit operators unchanged under OR default
    assert(LuceneLite.ast("text:a AND text:b", defaultOr = true) == And(t("a"), t("b")))
    // `-`/NOT excludes conjunctively, it does not OR-join:
    // `a -b` = a, excluding b
    assert(LuceneLite.ast("text:a -text:b", defaultOr = true) ==
      And(Not(t("b")), t("a")))
    // `+required` makes the other clauses score-only (ES bool semantics)
    assert(LuceneLite.ast("+text:a text:b", defaultOr = true) ==
      And(t("a"), ScoreOnly(t("b"))))
    // pure negative still matches everything-except
    assert(LuceneLite.ast("-text:a", defaultOr = true) == Not(t("a")))
    // field groups inherit the operator
    assert(LuceneLite.ast("text:(a b)", defaultOr = true) == Or(t("a"), t("b")))
    assert(LuceneLite.ast("text:(a b)") == And(t("a"), t("b")))
  }

  test("default-operator option and DSL field are validated loudly") {
    // per-query option protocol override reaches the compiler via Search;
    // resolveOperator itself normalizes and rejects junk
    assert(QueryCompiler.resolveOperator(
      QueryMeta.parse("#options:default-operator=or#text:a"), "AND") == "OR")
    assert(QueryCompiler.resolveOperator(QueryMeta.parse("text:a"), "AND") == "AND")
    intercept[IllegalArgumentException](QueryCompiler.resolveOperator(
      QueryMeta.parse("#options:default-operator=xor#text:a"), "AND"))
    // DSL query_string accepts the field; junk is loud
    assert(QueryCompiler.validate(
      """{"query":{"query_string":{"query":"text:a text:b","default_operator":"OR"}}}""").isRight)
    assert(QueryCompiler.validate(
      """{"query":{"query_string":{"query":"text:a","default_operator":"NAND"}}}""").isLeft)
  }

  test("simple_query_string compiles its operator set; malformed input is loud") {
    def v(q: String, extra: String = "") = QueryCompiler.validate(
      s"""{"query":{"simple_query_string":{"query":${q},"fields":["text"]$extra}}}""")
    // the full operator set in one expression
    assert(v("\"a + b* | -c (d \\\"e f\\\"~2) g~1\"").isRight)
    // field boosts and default_operator
    assert(QueryCompiler.validate(
      """{"query":{"simple_query_string":{"query":"a b","fields":["text","lang^2"],
         "default_operator":"and"}}}""").isRight)
    // loud: empty query, dangling operator, unclosed phrase/group,
    // prefix+fuzzy combination, missing fields, unknown options
    assert(v("\"\"").isLeft)
    assert(v("\"a +\"").isLeft)
    assert(v("\"a | | b\"").isLeft)
    assert(v("\"\\\"a b\"").isLeft)
    assert(v("\"(a b\"").isLeft)
    assert(v("\"a*~2\"").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"simple_query_string":{"query":"a"}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"simple_query_string":{"query":"a","fields":["text"],
         "flags":"ALL"}}}""").isLeft)
    // escaped specials are literal term characters
    assert(v("\"a\\\\+b\"").isRight)
  }

  test("span_containing / span_within: little span inside a big span_near") {
    import spark.implicits._
    val docs = Seq(
      ("1", "alpha mid beta"), ("2", "alpha beta"),
      ("3", "mid alpha one beta"), ("4", "alpha one two beta mid"))
      .toDF("doc_id", "text")
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    def body(op: String, little: String, slop: Int) =
      s"""{"query": {"$op": {
          "big": {"span_near": {"clauses": [
            {"span_term": {"text": "alpha"}}, {"span_term": {"text": "beta"}}],
            "slop": $slop, "in_order": true}},
          "little": {"span_term": {"text": "$little"}}}}}"""
    // 'mid' sits inside alpha..beta only in doc 1 (doc 3: before the big
    // span; doc 4: after it)
    assert(ids(body("span_containing", "mid", 2)) == Set("1"))
    // span_within has the identical match set at document granularity
    assert(ids(body("span_within", "mid", 2)) == Set("1"))
    // little = an endpoint: every big span contains it (docs where the big
    // span matches at all — slop 2 admits doc 4's two-gap span)
    assert(ids(body("span_containing", "alpha", 2)) == Set("1", "2", "3", "4"))
    // slop 0 leaves no gap token to hold a non-endpoint little: empty, not
    // an error (ES matches nothing)
    assert(ids(body("span_containing", "mid", 0)) == Set())
    // loud: missing little, field mismatch, unordered big
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"span_containing": {"big": {"span_near": {"clauses": [
          {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
          "slop": 0, "in_order": true}}}}}"""))
      .getMessage.contains("little"))
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"span_within": {
          "big": {"span_near": {"clauses": [
            {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
            "slop": 0, "in_order": true}},
          "little": {"span_term": {"lang": "a"}}}}}"""))
      .getMessage.contains("share one field"))
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"span_containing": {
          "big": {"span_near": {"clauses": [
            {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
            "slop": 1}},
          "little": {"span_term": {"text": "a"}}}}}"""))
      .getMessage.contains("in_order"))
  }

  test("span_multi lifts prefix/wildcard/regexp/fuzzy into span context") {
    import spark.implicits._
    val docs = Seq(
      ("1", "sparkling water"), ("2", "spark core"), ("3", "other stuff"))
      .toDF("doc_id", "text")
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(ids("""{"query": {"span_multi": {"match":
        {"prefix": {"text": "spark"}}}}}""") == Set("1", "2"))
    assert(ids("""{"query": {"span_multi": {"match":
        {"wildcard": {"text": "spark?ing"}}}}}""") == Set("1"))
    // span_multi composes inside span_or
    assert(ids("""{"query": {"span_or": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": "oth"}}}},
        {"span_term": {"text": "core"}}]}}}""") == Set("2", "3"))
    // loud: non-multi-term match, unknown option
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"span_multi": {"match": {"term": {"text": "spark"}}}}}"""))
      .getMessage.contains("prefix/wildcard/regexp/fuzzy"))
    assert(QueryCompiler.validate(
      """{"query":{"span_multi":{"match":{"prefix":{"text":"a"}},"boost":2}}}""").isLeft)
  }

  test("intervals: match/prefix/wildcard/any_of/all_of in the regex subset") {
    import spark.implicits._
    val docs = Seq(
      ("1", "alpha one beta"), ("2", "beta alpha"),
      ("3", "alpha beta gamma"), ("4", "gamma"))
      .toDF("doc_id", "text")
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    // ordered adjacency (max_gaps 0) vs one-gap budget
    assert(ids("""{"query": {"intervals": {"text": {"match":
        {"query": "alpha beta", "max_gaps": 0, "ordered": true}}}}}""")
      == Set("3"))
    assert(ids("""{"query": {"intervals": {"text": {"match":
        {"query": "alpha beta", "max_gaps": 1, "ordered": true}}}}}""")
      == Set("1", "3"))
    // unordered unbounded: both terms present, any order/distance
    assert(ids("""{"query": {"intervals": {"text": {"match":
        {"query": "alpha beta"}}}}}""") == Set("1", "2", "3"))
    // unordered bounded: adjacency either way
    assert(ids("""{"query": {"intervals": {"text": {"match":
        {"query": "alpha beta", "max_gaps": 0}}}}}""") == Set("2", "3"))
    // prefix and any_of union
    assert(ids("""{"query": {"intervals": {"text":
        {"prefix": {"prefix": "gam"}}}}}""") == Set("3", "4"))
    assert(ids("""{"query": {"intervals": {"text": {"any_of": {"intervals": [
        {"prefix": {"prefix": "gam"}},
        {"match": {"query": "one"}}]}}}}}""") == Set("1", "3", "4"))
    // all_of ordered unbounded: alpha then gamma somewhere after
    assert(ids("""{"query": {"intervals": {"text": {"all_of": {
        "intervals": [{"match": {"query": "alpha"}}, {"match": {"query": "gamma"}}],
        "ordered": true}}}}}""") == Set("3"))
    // all_of unordered unbounded: conjunction of sub-rules of any shape
    assert(ids("""{"query": {"intervals": {"text": {"all_of": {
        "intervals": [{"prefix": {"prefix": "alph"}},
          {"match": {"query": "beta"}}]}}}}}""") == Set("1", "2", "3"))
    // loud: oversized gap budget fails instead of silently clamping
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"intervals": {"text": {"all_of": {
          "intervals": [{"match": {"query": "a"}}, {"match": {"query": "b"}}],
          "ordered": true, "max_gaps": 5000}}}}}"""))
      .getMessage.contains("max_gaps <= 1000"))
    // loud: fuzzy rule stays out of the declared subset
    assert(QueryCompiler.validate(
      """{"query":{"intervals":{"text":{"fuzzy":{"term":"a"}}}}}""").isLeft)
    // loud: all_of with a budget needs single-term match sub-rules
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"intervals": {"text": {"all_of": {
          "intervals": [{"match": {"query": "two words"}},
            {"match": {"query": "b"}}],
          "ordered": true, "max_gaps": 1}}}}}"""))
      .getMessage.contains("single-term"))
  }

  test("nested: per-element conjunction over array-of-struct (ES semantics)") {
    import spark.implicits._
    val docs = Seq(
      ("1", Seq(("F", 100.0), ("O", 300.0))),
      ("2", Seq(("F", 300.0))),
      ("3", Seq(("O", 500.0))))
      .toDF("doc_id", "raw")
      .select(col("doc_id"), expr(
        "transform(raw, x -> struct(x._1 as status, x._2 as price))").as("orders"))
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    // THE nested distinction: doc 1 has status=F and price>=200 in
    // DIFFERENT elements — a flat cross-element AND would wrongly match it
    assert(ids("""{"query": {"nested": {"path": "orders", "query": {"bool": {
        "must": [{"term": {"orders.status": "F"}},
                 {"range": {"orders.price": {"gte": 200}}}]}}}}}""") == Set("2"))
    // single inner term / terms / exists
    assert(ids("""{"query": {"nested": {"path": "orders",
        "query": {"term": {"orders.status": "O"}}}}}""") == Set("1", "3"))
    assert(ids("""{"query": {"nested": {"path": "orders",
        "query": {"terms": {"orders.status": ["O"]}}}}}""") == Set("1", "3"))
    assert(ids("""{"query": {"nested": {"path": "orders",
        "query": {"exists": {"field": "orders.price"}}}}}""") == Set("1", "2", "3"))
    // bool should without positives: either term, per element
    assert(ids("""{"query": {"nested": {"path": "orders", "query": {"bool": {
        "should": [{"range": {"orders.price": {"gt": 400}}},
                   {"term": {"orders.status": "F"}}]}}}}}""") == Set("1", "2", "3"))
    // must_not inside the element: an element that is NOT status F and
    // has price < 400
    assert(ids("""{"query": {"nested": {"path": "orders", "query": {"bool": {
        "must": [{"range": {"orders.price": {"lt": 400}}}],
        "must_not": [{"term": {"orders.status": "F"}}]}}}}}""") == Set("1"))
    // score_mode none accepted; others loud
    assert(ids("""{"query": {"nested": {"path": "orders", "score_mode": "none",
        "query": {"term": {"orders.status": "F"}}}}}""") == Set("1", "2"))
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"nested": {"path": "orders", "score_mode": "sum",
          "query": {"term": {"orders.status": "F"}}}}}"""))
      .getMessage.contains("score_mode"))
    // loud: inner field must carry the path prefix; unsupported inner op
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"nested": {"path": "orders",
          "query": {"term": {"status": "F"}}}}}"""))
      .getMessage.contains("orders.<field>"))
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"nested": {"path": "orders",
          "query": {"wildcard": {"orders.status": "F*"}}}}}"""))
      .getMessage.contains("declared subset"))
  }

  test("multi_match types: best_fields dis_max, phrase, cross_fields") {
    import spark.implicits._
    val docs = Seq(
      ("1", "spark fast", "spark"),   // strong in both fields
      ("2", "spark slow", "other"),   // text only
      ("3", "nothing", "spark fast")) // tag only
      .toDF("doc_id", "text", "tag")
    def scored(q: String): Map[String, Long] = {
      val c = QueryCompiler.compile(q, 100, "doc_id")
      docs.where(c.predicate).withColumn("_s", c.score.cast("long"))
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    }
    val best = scored("""{"query": {"multi_match": {"query": "spark fast",
      "fields": ["text", "tag"], "type": "best_fields"}}}""")
    // doc 1: max(text 2, tag 1) = 2; doc 2: 1; doc 3: max(0, 2) = 2
    assert(best == Map("1" -> 2L, "2" -> 1L, "3" -> 2L))
    val phrase = scored("""{"query": {"multi_match": {"query": "spark fast",
      "fields": ["text", "tag"], "type": "phrase"}}}""")
    assert(phrase.keySet == Set("1", "3")) // contiguous phrase only
    val cross = scored("""{"query": {"multi_match": {"query": "spark fast",
      "fields": ["text", "tag"], "type": "cross_fields",
      "operator": "and"}}}""")
    assert(cross.keySet == Set("1", "3")) // each term in ANY field
    assert(intercept[IllegalArgumentException](
      scored("""{"query": {"multi_match": {"query": "x",
        "fields": ["a^2"], "type": "cross_fields"}}}"""))
      .getMessage.contains("boosts unsupported"))
  }

  test("script query: painless-lite filter over doc fields and params") {
    import spark.implicits._
    val docs = Seq(("1", 10L, "a"), ("2", 80L, "a"), ("3", 90L, "b"))
      .toDF("doc_id", "n", "k")
    def ids(q: String): Set[String] =
      docs.where(QueryCompiler.compile(q, 100, "doc_id").predicate)
        .collect().map(_.getString(0)).toSet
    assert(ids("""{"query": {"script": {"script": {
        "source": "doc.n + 5 > params.lo && doc.k == params.kk",
        "params": {"lo": 50, "kk": "a"}}}}}""") == Set("2"))
    // short string form; unbound identifiers loud
    assert(ids("""{"query": {"script": {"script": "doc.n < 50"}}}""") == Set("1"))
    assert(intercept[IllegalArgumentException](
      ids("""{"query": {"script": {"script": "mystery > 1"}}}"""))
      .getMessage.contains("unbound identifier"))
  }

  test("term case_insensitive: lowercased compare; wildcard gates false") {
    import spark.implicits._
    val docs = Seq(("1", "EN"), ("2", "en"), ("3", "de"))
      .toDF("doc_id", "lang")
    def ids(q: String): Set[String] =
      docs.where(QueryCompiler.compile(q, 100, "doc_id").predicate)
        .collect().map(_.getString(0)).toSet
    assert(ids("""{"query": {"term": {"lang": "en"}}}""") == Set("2"))
    assert(ids("""{"query": {"term": {"lang": {"value": "En",
      "case_insensitive": true}}}}""") == Set("1", "2"))
    // wildcard matches analyzed text: true accepted, false loud
    assert(ids("""{"query": {"wildcard": {"lang": {"value": "E*",
      "case_insensitive": true}}}}""") == Set("1", "2"))
    assert(intercept[IllegalArgumentException](
      ids("""{"query": {"wildcard": {"lang": {"value": "E*",
        "case_insensitive": false}}}}"""))
      .getMessage.contains("case_insensitive:false unsupported"))
  }

  test("geo_bounding_box and geo_distance over struct<lat,lon> points") {
    import spark.implicits._
    val docs = Seq(
      ("1", 0.0, 0.0), ("2", 0.0, 1.0), ("3", 0.0, 10.0), ("4", 80.0, 179.0))
      .toDF("doc_id", "lat", "lon")
      .select(col("doc_id"), struct(col("lat"), col("lon")).as("loc"))
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(ids("""{"query": {"geo_bounding_box": {"loc": {
        "top_left": {"lat": 30, "lon": -30},
        "bottom_right": {"lat": -30, "lon": 5}}}}}""") == Set("1", "2"))
    // antimeridian wrap: left > right means lon >= left OR lon <= right
    assert(ids("""{"query": {"geo_bounding_box": {"loc": {
        "top_left": {"lat": 90, "lon": 170},
        "bottom_right": {"lat": -90, "lon": -160}}}}}""") == Set("4"))
    // haversine: 1 deg lon at the equator ~ 111.2 km
    assert(ids("""{"query": {"geo_distance": {"distance": "150km",
        "loc": {"lat": 0, "lon": 0}}}}}""") == Set("1", "2"))
    assert(ids("""{"query": {"geo_distance": {"distance": "1200km",
        "loc": {"lat": 0, "lon": 0}}}}}""") == Set("1", "2", "3"))
    // unit forms are equivalent
    assert(ids("""{"query": {"geo_distance": {"distance": "150000m",
        "loc": {"lat": 0, "lon": 0}}}}}""") == Set("1", "2"))
    // loud: inverted box, bad unit, out-of-range center
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"geo_bounding_box": {"loc": {
          "top_left": {"lat": -30, "lon": 0},
          "bottom_right": {"lat": 30, "lon": 5}}}}}"""))
      .getMessage.contains("top_left.lat"))
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"geo_distance": {"distance": "100parsec",
          "loc": {"lat": 0, "lon": 0}}}}}"""))
      .getMessage.contains("unparseable"))
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"geo_distance": {"distance": "1km",
          "loc": {"lat": 99, "lon": 0}}}}}"""))
      .getMessage.contains("lat out of range"))
  }

  test("distance_feature / rank_feature: decay-scored double leaves") {
    import spark.implicits._
    val docs = Seq(
      ("1", 0.0, 0.0, 10.0), ("2", 0.0, 1.0, 90.0), ("3", 50.0, 100.0, 0.0))
      .toDF("doc_id", "lat", "lon", "pagerank")
      .select(col("doc_id"), struct(col("lat"), col("lon")).as("loc"),
        col("pagerank"))
    def hits(q: String) = Search.search(docs, q, IndexConfig(),
        Seq("doc_id"))
      .select("doc_id", "_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // distance_feature: origin point scores 1.0 (pivot/(pivot+0)); a
    // point one degree away (~111.2km) scores pivot/(pivot+dist) < 1
    val d = hits("""{"query": {"distance_feature": {"field": "loc",
        "origin": {"lat": 0, "lon": 0}, "pivot": "100km"}}}""")
    assert(d("1") == 1.0)
    assert(d("2") > 0.4 && d("2") < 0.5) // 100/(100+111.2) ~ 0.473
    assert(d("3") < 0.02)
    // rank_feature saturation: x/(x+pivot) with explicit pivot 10
    val r = hits("""{"query": {"rank_feature": {"field": "pagerank",
        "saturation": {"pivot": 10}}}}""")
    assert(r("1") == 0.5 && r("2") == 0.9 && r("3") == 0.0)
    // boost scales the decay
    val rb = hits("""{"query": {"rank_feature": {"field": "pagerank",
        "saturation": {"pivot": 10}, "boost": 2}}}""")
    assert(rb("1") == 1.0)
    // loud: missing pivot, date-form origin, log form
    assert(QueryCompiler.validate(
      """{"query":{"rank_feature":{"field":"f"}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"rank_feature":{"field":"f","log":{"scaling_factor":2}}}}""").isLeft)
    assert(QueryCompiler.validate(
      """{"query":{"distance_feature":{"field":"f","origin":"2024-01-01",
         "pivot":"7d"}}}""").isLeft)
  }

  test("search template: typed mustache substitution, fail-loud hygiene") {
    import spark.implicits._
    val docs = Seq(("1", "alpha beta", 5L), ("2", "gamma", 50L))
      .toDF("doc_id", "text", "views")
    def ids(req: String) = Search.searchTemplate(docs, req, IndexConfig(),
        Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    // quoted placeholders splice typed: the number lands unquoted
    assert(ids("""{"source": {"query": {"bool": {"must": [
        {"match": {"text": "{{word}}"}},
        {"range": {"views": {"gte": "{{min_views}}"}}}]}}},
        "params": {"word": "alpha", "min_views": 3}}""") == Set("1"))
    // string source + bare splice inside a longer string
    assert(ids("""{"source": "{\"query\": {\"wildcard\": {\"text\": \"{{pre}}*\"}}}",
        "params": {"pre": "gam"}}""") == Set("2"))
    // loud: missing param, unused param, sections
    assert(intercept[IllegalArgumentException](Search.renderTemplate(
      """{"source": {"query": {"term": {"text": "{{w}}"}}}, "params": {}}"""))
      .getMessage.contains("without params"))
    assert(intercept[IllegalArgumentException](Search.renderTemplate(
      """{"source": {"query": {"match_all": {}}}, "params": {"w": 1}}"""))
      .getMessage.contains("without placeholders"))
    assert(intercept[IllegalArgumentException](Search.renderTemplate(
      """{"source": "{{#cond}}x{{/cond}}", "params": {"cond": true}}"""))
      .getMessage.contains("sections"))
  }

  test("span_not rejects the include term at both exclude endpoints") {
    import spark.implicits._
    val docs = Seq(("1", "fox fox fox")).toDF("doc_id", "text")
    def ids(q: String) = Search.search(docs, q, IndexConfig(), Seq("doc_id"))
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(intercept[IllegalArgumentException](ids(
      """{"query": {"span_not": {
          "include": {"span_term": {"text": "fox"}},
          "exclude": {"span_near": {"clauses": [
            {"span_term": {"text": "fox"}}, {"span_term": {"text": "fox"}}],
            "slop": 0, "in_order": true}}}}}"""))
      .getMessage.contains("both endpoints"))
  }

  test("expandSynonyms: leaf expansion, multi-token split, pass-through") {
    val syn = Map("quick" -> Seq("fast"))
    // single-token hit -> bool.should of original + synonyms
    val one = QueryCompiler.expandSynonyms(
      """{"query": {"match": {"text": "quick"}}}""", syn)
    assert(one.contains("should") && one.contains("fast")
      && one.contains("minimum_should_match"))
    // multi-token: per-token shoulds under a must
    val multi = QueryCompiler.expandSynonyms(
      """{"query": {"match": {"text": "quick spark"}}}""", syn)
    assert(multi.contains("must") && multi.contains("fast")
      && multi.contains("spark"))
    // no synonym hits -> leaf verbatim
    val none = QueryCompiler.expandSynonyms(
      """{"query": {"match": {"text": "slow turtle"}}}""", syn)
    assert(none.contains("slow turtle") && !none.contains("should"))
    // term leaves expand without tokenization; other operators untouched
    val term = QueryCompiler.expandSynonyms(
      """{"query": {"bool": {"must": [{"term": {"lang": "quick"}},
          {"range": {"n": {"gte": 1}}}]}}}""", syn)
    assert(term.contains("fast") && term.contains("range"))
    // empty synonym list is loud
    intercept[IllegalArgumentException](QueryCompiler.expandSynonyms(
      """{"query": {"match": {"text": "x"}}}""", Map("x" -> Seq.empty)))
  }

  test("date math: anchors, arithmetic, rounding floor/ceil, week=Monday") {
    import java.time.Instant
    val now = Instant.parse("2024-01-25T12:34:56Z")
    def r(e: String) = QueryCompiler.DateMath.resolve(e, now)
    assert(r("now") == ((now, now)))
    assert(r("now-7d") == ((Instant.parse("2024-01-18T12:34:56Z"),
      Instant.parse("2024-01-18T12:34:56Z"))))
    assert(r("now/d") == ((Instant.parse("2024-01-25T00:00:00Z"),
      Instant.parse("2024-01-25T23:59:59.999999Z"))))
    assert(r("now-1M/M")._1 == Instant.parse("2023-12-01T00:00:00Z"))
    // 2024-01-25 is a Thursday → week floors to Monday the 22nd
    assert(r("now/w")._1 == Instant.parse("2024-01-22T00:00:00Z"))
    assert(r("2024-01-15||+1M/d") == ((Instant.parse("2024-02-15T00:00:00Z"),
      Instant.parse("2024-02-15T23:59:59.999999Z"))))
    assert(r("now+2h-30m")._1 == Instant.parse("2024-01-25T14:04:56Z"))
    intercept[IllegalArgumentException](r("tomorrow"))
    intercept[IllegalArgumentException](r("now/d+1d")) // rounding must end it
  }

  test("range with date math: operator-dependent rounding, pinned now, " +
       "UTC-only time_zone gate") {
    import spark.implicits._
    val df = Seq(
      ("a", "2024-01-17 23:59:59"), ("b", "2024-01-18 00:00:00"),
      ("c", "2024-01-24 23:59:59"), ("d", "2024-01-25 00:00:00"))
      .toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("timestamp").as("ts"))
    def run(q: String) = {
      val cq = QueryCompiler.compile(q)
      df.where(cq.predicate).collect().map(_.getString(0)).toSet
    }
    // gte floors, lt floors: [Jan 18, Jan 25)
    assert(run("""{"query": {"range": {"ts": {"gte": "now-7d/d", "lt": "now/d"}}},
        "now": "2024-01-25T12:00:00Z"}""") == Set("b", "c"))
    // lte ceils: Jan 25 itself included
    assert(run("""{"query": {"range": {"ts": {"gte": "now-7d/d", "lte": "now/d"}}},
        "now": "2024-01-25T12:00:00Z"}""") == Set("b", "c", "d"))
    // gt ceils: the whole floor day excluded
    assert(run("""{"query": {"range": {"ts": {"gt": "now-8d/d"}}},
        "now": "2024-01-25T12:00:00Z"}""") == Set("b", "c", "d"))
    // UTC time_zone accepted; anything else is loud, not ignored
    assert(run("""{"query": {"range": {"ts": {"gte": "now/d", "time_zone": "UTC"}}},
        "now": "2024-01-25T12:00:00Z"}""") == Set("d"))
    intercept[IllegalArgumentException](run(
      """{"query": {"range": {"ts": {"gte": "now/d", "time_zone": "+02:00"}}},
        "now": "2024-01-25T12:00:00Z"}"""))
  }

  test("validateExplain: success carries the compiled predicate as SQL, " +
       "failure keeps the error") {
    val ok = QueryCompiler.validateExplain("lang:en")
    assert(ok.isRight && ok.toOption.get.contains("rlike(lower(lang)"), ok)
    val term = QueryCompiler.validateExplain("""{"query":{"term":{"lang":"en"}}}""")
    assert(term == Right("`=`(lang, 'en')"), term)
    val bad = QueryCompiler.validateExplain("text:spark AND (")
    assert(bad.isLeft)
  }

  test("range bound that merely LOOKS like date math falls back to the " +
       "scalar compare (ES keyword-range behavior)") {
    import spark.implicits._
    val df = Seq(("1", "atlantis"), ("2", "nowhere"), ("3", "utopia"))
      .toDF("doc_id", "s")
    def run(q: String) = df.where(QueryCompiler.compile(q).predicate)
      .collect().map(_.getString(0)).toSet
    // "nowhere" starts with "now" but is not date math → lexicographic
    assert(run("""{"query": {"range": {"s": {"gte": "nowhere"}}}}""")
      == Set("2", "3"))
    assert(run("""{"query": {"range": {"s": {"lt": "nowhere"}}}}""")
      == Set("1"))
    // real date math on a timestamp column still resolves (control)
    val ts = Seq(("a", "2024-01-24 12:00:00"), ("b", "2024-01-26 12:00:00"))
      .toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("timestamp").as("ts"))
    val cq = QueryCompiler.compile(
      """{"query": {"range": {"ts": {"gte": "now/d"}}},
         "now": "2024-01-25T12:00:00Z"}""")
    assert(ts.where(cq.predicate).collect().map(_.getString(0)).toSet
      == Set("b"))
  }

  test("r11: unparseable date math on a DATE field raises (ES parse error) " +
       "while the keyword fallback keeps working under the same schema") {
    import spark.implicits._
    val ts = Seq(("a", "2024-01-24 12:00:00"))
      .toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("timestamp").as("ts"),
        lit("nowhere-ville").as("kw"))
    // typo'd unit on a timestamp column: with the schema hint the compile
    // FAILS LOUDLY instead of silently becoming a null predicate
    val e = intercept[IllegalArgumentException] {
      QueryCompiler.compile(
        """{"query": {"range": {"ts": {"gte": "now-1x"}}}}""",
        schema = ts.schema)
    }
    assert(e.getMessage.contains("date math") && e.getMessage.contains("ts"),
      e.getMessage)
    // the same schema still lets a keyword bound degrade to scalar compare
    val cq = QueryCompiler.compile(
      """{"query": {"range": {"kw": {"gte": "nowhere"}}}}""",
      schema = ts.schema)
    assert(ts.where(cq.predicate).count() == 1)
    // with NO schema hint the compile stays lenient (it cannot know the
    // field type); under ANSI the bad bound then fails at RUNTIME with an
    // opaque cast error — which is exactly why the schema-aware compile
    // path above fails fast with the field name instead
    val lenient = QueryCompiler.compile(
      """{"query": {"range": {"ts": {"gte": "now-1x"}}}}""")
    intercept[Exception](ts.where(lenient.predicate).count())
    // the search entry point threads the frame schema automatically
    val e2 = intercept[IllegalArgumentException] {
      Search.search(ts, """{"query": {"range": {"ts": {"gte": "now-1x"}}}}""",
        IndexConfig()).collect()
    }
    assert(e2.getMessage.contains("date math"), e2.getMessage)
  }
}
