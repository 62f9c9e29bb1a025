package graft

import org.scalatest.funsuite.AnyFunSuite

/** ES|QL-lite pipe compiler (esql.scala): stage semantics, expression
  * grammar, plan shape. */
class EsqlSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta", "en", 10L, 1.5),
    (2L, "gamma", "en", 20L, 2.5),
    (3L, "delta epsilon zeta", "de", 30L, 3.5),
    (4L, "eta", "fr", 40L, 4.5))
    .toDF("id", "text", "lang", "n", "v")

  private def cat = Map("docs" -> docs)

  test("FROM | WHERE | KEEP | SORT | LIMIT: the basic pipe") {
    val out = Esql.run(
      "FROM docs | WHERE n >= 20 AND lang != \"fr\" " +
        "| KEEP id, lang | SORT id DESC | LIMIT 1",
      cat).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L))
    assert(out.head.schema.fieldNames.toSeq == Seq("id", "lang"))
  }

  test("EVAL: computed columns, overwrite, function calls") {
    val out = Esql.run(
      "FROM docs | EVAL w = n * 2 + LENGTH(lang), lang = TO_UPPER(lang) " +
        "| KEEP id, w, lang | SORT id",
      cat).collect()
    assert(out.head.getLong(1) == 22L && out.head.getString(2) == "EN")
    assert(out(2).getLong(1) == 62L)
  }

  test("STATS: named aggregates, BY keys, global form") {
    val by = Esql.run(
      "FROM docs | STATS c = COUNT(*), total = SUM(n), top = MAX(v) BY lang " +
        "| SORT lang",
      cat).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(by == Seq(("de", 1L, 30L), ("en", 2L, 30L), ("fr", 1L, 40L)))
    val g = Esql.run("FROM docs | STATS m = MEDIAN(n), p = PERCENTILE(n, 25)", cat)
      .collect().head
    assert(g.getDouble(0) == 25.0 && g.getDouble(1) == 17.5)
    assert(intercept[IllegalArgumentException](
      Esql.run("FROM docs | STATS COUNT(*)", cat))
      .getMessage.contains("needs a name"))
    // scalar functions wrap aggregates inline (the natural ES|QL form)
    val wrapped = Esql.run(
      "FROM docs | STATS r = ROUND(SUM(v) / COUNT(*), 2) BY lang | SORT lang",
      cat).collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(wrapped == Seq(("de", 3.5), ("en", 2.0), ("fr", 4.5)))
    // a STATS entry with no aggregate call is an EVAL, not a STATS
    assert(intercept[IllegalArgumentException](
      Esql.run("FROM docs | STATS r = n * 2", cat))
      .getMessage.contains("needs an aggregate call"))
  }

  test("LIKE, IN, DISSECT, RENAME, LOOKUP JOIN") {
    val like = Esql.run(
      """FROM docs | WHERE text LIKE "*eta*" | STATS c = COUNT(*)""", cat)
      .collect().head.getLong(0)
    assert(like == 3L) // beta, zeta, eta
    val in = Esql.run(
      """FROM docs | WHERE lang IN ("de", "fr") | STATS c = COUNT(*)""", cat)
      .collect().head.getLong(0)
    assert(in == 2L)
    val dis = Esql.run(
      "FROM docs | EVAL s = CONCAT(lang, \"-\", TO_STRING(n)) " +
        "| DISSECT s \"%{l}-%{num}\" | KEEP id, l, num | SORT id", cat).collect()
    assert(dis.head.getString(1) == "en" && dis.head.getString(2) == "10")
    val dims = Seq(("en", "english"), ("de", "german")).toDF("lang", "lang_name")
    val lk = Esql.run(
      "FROM docs | LOOKUP JOIN dims ON lang | WHERE lang_name == \"german\" " +
        "| KEEP id", cat + ("dims" -> dims)).collect()
    assert(lk.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("ROUND keeps its literal-Long scale (weak-lub regression)") {
    val out = Esql.run(
      "FROM docs | EVAL r = ROUND(v / 3, 2) | KEEP id, r | SORT id | LIMIT 1",
      cat).collect().head.getDouble(1)
    assert(out == 0.5)
    assert(intercept[IllegalArgumentException](
      Esql.run("FROM docs | EVAL r = ROUND(v, n)", cat))
      .getMessage.contains("literal integer"))
  }

  test("MV_EXPAND explodes multi-value columns") {
    val out = Esql.run(
      "FROM docs | EVAL toks = SPLIT(text, \" \") | MV_EXPAND toks " +
        "| STATS c = COUNT(*)", cat).collect().head.getLong(0)
    assert(out == 7L) // 2 + 1 + 3 + 1 tokens
  }

  test("plan shape: WHERE pushes into the scan, KEEP prunes columns") {
    // write a parquet table so pushdown is observable
    val dir = java.nio.file.Files.createTempDirectory("esql_plan").toString
    docs.write.mode("overwrite").parquet(s"$dir/t.parquet")
    val t = spark.read.parquet(s"$dir/t.parquet")
    val plan = Esql.run(
      """FROM t | WHERE n > 15 | KEEP id, n | SORT n | LIMIT 2""",
      Map("t" -> t)).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n), GreaterThan(n,15)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint,n:bigint>"),
      s"columns not pruned:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"sort+limit not fused:\n$plan")
  }

  test("CASE, TRIM, REPLACE functions") {
    val out = Esql.run(
      "FROM docs | EVAL band = CASE(n < 15, \"low\", n < 35, \"mid\", \"high\"), " +
        "t = REPLACE(TRIM(CONCAT(\" \", lang, \" \")), \"e\", \"3\") " +
        "| KEEP id, band, t | SORT id", cat).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(out == Seq((1L, "low", "3n"), (2L, "mid", "3n"),
      (3L, "mid", "d3"), (4L, "high", "fr")))
    // CASE with no default yields null beyond the conditions
    val nul = Esql.run(
      "FROM docs | EVAL x = CASE(n > 100, 1) | WHERE x IS NULL " +
        "| STATS c = COUNT(*)", cat).collect().head.getLong(0)
    assert(nul == 4L)
  }

  test("GROK: library patterns to named captures, null on non-match") {
    val logs = Seq((1L, "ERROR disk full on 10.0.0.7"), (2L, "not a log line"))
      .toDF("id", "line")
    val out = Esql.run(
      "FROM logs | GROK line \"%{LOGLEVEL:lvl} %{GREEDYDATA:msg} on %{IP:host}\" " +
        "| KEEP id, lvl, host | SORT id", Map("logs" -> logs)).collect()
    assert(out(0).getString(1) == "ERROR" && out(0).getString(2) == "10.0.0.7")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(intercept[IllegalArgumentException](Esql.run(
      "FROM logs | GROK line \"%{NOPE:x}\"", Map("logs" -> logs)))
      .getMessage.contains("unknown GROK pattern"))
  }

  test("BY expressions, BUCKET, DATE_TRUNC, IS NULL") {
    val b = Esql.run(
      "FROM docs | STATS c = COUNT(*) BY g = BUCKET(n, 25) | SORT g", cat)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(b == Seq((0L, 2L), (25L, 2L))) // n=10,20 → 0; n=30,40 → 25
    val nulls = Esql.run(
      "FROM docs | EVAL x = NULL | WHERE x IS NULL | STATS c = COUNT(*)", cat)
      .collect().head.getLong(0)
    assert(nulls == 4L)
    val ts = Seq((1L, java.sql.Timestamp.valueOf("2024-03-05 13:45:00")))
      .toDF("id", "ts")
    val d = Esql.run(
      "FROM t | EVAL d = TO_UNIX_MICROS(DATE_TRUNC(\"day\", ts)) | KEEP d",
      Map("t" -> ts)).collect().head.getLong(0)
    assert(d == java.sql.Timestamp.valueOf("2024-03-05 00:00:00").getTime * 1000L)
  }

  test("ENRICH aliases LOOKUP JOIN; INLINESTATS joins group stats back") {
    val dims = Seq(("en", "english"), ("de", "german")).toDF("lang", "lang_name")
    val en = Esql.run(
      "FROM docs | ENRICH dims ON lang | WHERE lang_name IS NOT NULL " +
        "| STATS c = COUNT(*)", cat + ("dims" -> dims))
      .collect().head.getLong(0)
    assert(en == 3L) // 2 en + 1 de
    val inl = Esql.run(
      "FROM docs | INLINESTATS total = SUM(n) BY lang " +
        "| EVAL share = TO_LONG(n * 100 / total) | KEEP id, total, share | SORT id",
      cat).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // en total 30 (10+20), de 30, fr 40 — every row keeps its identity
    assert(inl == Seq((1L, 30L, 33L), (2L, 30L, 66L), (3L, 30L, 100L),
      (4L, 40L, 100L)))
    // global (no BY) broadcasts one row onto all
    val g = Esql.run("FROM docs | INLINESTATS m = MAX(n) | STATS c = COUNT_DISTINCT(m)",
      cat).collect().head.getLong(0)
    assert(g == 1L)
  }

  test("LOOKUP JOIN on composite keys") {
    val dims = Seq(("en", 10L, "en-ten"), ("en", 20L, "en-twenty"),
      ("de", 30L, "de-thirty")).toDF("lang", "n", "tag")
    val out = Esql.run(
      "FROM docs | LOOKUP JOIN dims ON lang, n | KEEP id, tag | SORT id",
      Map("docs" -> docs, "dims" -> dims))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-")))
    assert(out.toSeq == Seq((1L, "en-ten"), (2L, "en-twenty"),
      (3L, "de-thirty"), (4L, "-")))
    assert(intercept[IllegalArgumentException](
      Esql.run("FROM docs | LOOKUP JOIN dims ON lang, lang",
        Map("docs" -> docs, "dims" -> dims)))
      .getMessage.contains("duplicate key"))
  }

  test("ROW: one-row literal source feeding the pipe") {
    val out = Esql.run(
      "ROW a = 1, b = \"x\", c = 2.5 | EVAL d = a + c | KEEP a, b, d",
      cat).collect().head
    assert(out.getLong(0) == 1L && out.getString(1) == "x" &&
      out.getDouble(2) == 3.5)
  }

  test("SAMPLE: deterministic seeded Bernoulli, stable across runs") {
    val many = (1L to 400L).map(i => (i, s"t$i")).toDF("id", "text")
    val a1 = Esql.run("FROM d | SAMPLE 0.25 7 | STATS c = COUNT(*)",
      Map("d" -> many)).collect().head.getLong(0)
    val a2 = Esql.run("FROM d | SAMPLE 0.25 7 | STATS c = COUNT(*)",
      Map("d" -> many)).collect().head.getLong(0)
    assert(a1 == a2 && a1 > 40 && a1 < 160) // reproducible, plausibly ~100
    val b = Esql.run("FROM d | SAMPLE 0.25 8 | STATS c = COUNT(*)",
      Map("d" -> many)).collect().head.getLong(0)
    assert(b > 40 && b < 160)
    assert(intercept[IllegalArgumentException](
      Esql.run("FROM d | SAMPLE 1.5", Map("d" -> many)))
      .getMessage.contains("probability"))
  }

  test("CHANGE_POINT: first new-regime key over a keyed series") {
    val series = (1 to 10).map(k => (k.toLong, if (k <= 6) 5L else 50L))
      .toDF("k", "c")
    val out = Esql.run("FROM s | CHANGE_POINT c ON k", Map("s" -> series))
      .collect().head
    assert(out.getLong(0) == 7L) // the step starts at k=7
    assert(out.getDouble(1) > 0)
  }

  test("math, string, MV, date, and ip function families") {
    val out = Esql.run(
      "ROW s = \"abcdef\", n = 16.0, ip = \"10.1.2.3\", t = \"2024-03-05 10:30:00\" " +
        "| EVAL lf = LEFT(s, 2), rt = RIGHT(s, 2), rev = REVERSE(s), " +
        "p = POW(2.0, 3.0), lg = LOG(2.0, n), sq = SQRT(n), " +
        "loc = LOCATE(s, \"cd\"), " +
        "inblock = CIDR_MATCH(ip, \"10.0.0.0/8\"), " +
        "outblock = CIDR_MATCH(ip, \"192.168.0.0/16\"), " +
        "net = IP_PREFIX(ip, 12, 0), " +
        "ts = DATE_PARSE(\"yyyy-MM-dd HH:mm:ss\", t), " +
        "day = DATE_EXTRACT(\"day_of_month\", ts), " +
        "fmt = DATE_FORMAT(\"yyyy/MM\", ts) " +
        "| KEEP lf, rt, rev, p, lg, sq, loc, inblock, outblock, net, day, fmt",
      cat).collect().head
    assert(out.getString(0) == "ab" && out.getString(1) == "ef" &&
      out.getString(2) == "fedcba")
    assert(out.getDouble(3) == 8.0 && out.getDouble(4) == 4.0 &&
      out.getDouble(5) == 4.0)
    assert(out.getInt(6) == 3)
    assert(out.getBoolean(7) && !out.getBoolean(8))
    assert(out.getString(9) == "10.0.0.0")
    assert(out.getLong(10) == 5L && out.getString(11) == "2024/03")
    val mv = Esql.run(
      "FROM docs | WHERE id == 1 | EVAL parts = SPLIT(text, \" \"), " +
        "mn = MV_MIN(parts), mx = MV_MAX(parts), cnt = MV_COUNT(parts), " +
        "joined = MV_CONCAT(parts, \"-\"), first = MV_FIRST(parts), " +
        "srt = MV_CONCAT(MV_SORT(parts, \"DESC\"), \",\") " +
        "| KEEP mn, mx, cnt, joined, first, srt",
      cat).collect().head
    assert(mv.getString(0) == "alpha" && mv.getString(1) == "beta")
    assert(mv.getInt(2) == 2 && mv.getString(3) == "alpha-beta")
    assert(mv.getString(4) == "alpha" && mv.getString(5) == "beta,alpha")
    val mv2 = Esql.run(
      "ROW a = 1 | EVAL l = SPLIT(\"3 1 2\", \" \"), " +
        "zipd = MV_CONCAT(MV_ZIP(l, MV_SORT(l), \"-\"), \",\"), " +
        "app = MV_COUNT(MV_APPEND(l, l)) | KEEP zipd, app",
      cat).collect().head
    assert(mv2.getString(0) == "3-1,1-2,2-3" && mv2.getInt(1) == 6)
    val med = Esql.run(
      "ROW a = 1 | EVAL l = SPLIT(\"4 1 3 2\", \" \"), m = MV_MEDIAN(l) | KEEP m",
      cat).collect().head.getDouble(0)
    assert(med == 2.5) // even size averages the two central values
    val casts = Esql.run(
      "ROW s = \"41\", b = \"true\", t = \"2024-05-06 07:08:09\" " +
        "| EVAL i = TO_INTEGER(s), bb = TO_BOOLEAN(b), " +
        "dt = DATE_EXTRACT(\"day_of_month\", TO_DATETIME(t)) | KEEP i, bb, dt",
      cat).collect().head
    assert(casts.getInt(0) == 41 && casts.getBoolean(1) && casts.getLong(2) == 6L)
    val dd = Esql.run(
      "ROW a = \"2024-01-01 00:00:00\", b = \"2024-01-03 12:00:00\" " +
        "| EVAL s = DATE_PARSE(\"yyyy-MM-dd HH:mm:ss\", a), " +
        "e = DATE_PARSE(\"yyyy-MM-dd HH:mm:ss\", b), " +
        "d = DATE_DIFF(\"days\", s, e), h = DATE_DIFF(\"hours\", s, e) " +
        "| KEEP d, h", cat).collect().head
    assert(dd.getLong(0) == 2L && dd.getLong(1) == 60L)
  }

  test("BUCKET 4-arg target-count form") {
    val by = Esql.run(
      "FROM docs | STATS c = COUNT(*) BY b = BUCKET(n, 4, 0, 40) | SORT b",
      cat).collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // span (40-0)/4 = 10: n=10→10, 20→20, 30→30, 40→40 (floor boundary)
    assert(by == Seq((10.0, 1L), (20.0, 1L), (30.0, 1L), (40.0, 1L)))
    assert(intercept[IllegalArgumentException](Esql.run(
      "FROM docs | STATS c = COUNT(*) BY b = BUCKET(n, 4, 40, 0)", cat))
      .getMessage.contains("max > min"))
  }

  test("TOP, VALUES, WEIGHTED_AVG aggregates") {
    val out = Esql.run(
      "FROM docs | STATS t = TOP(n, 2, \"desc\"), vs = VALUES(lang), " +
        "wa = WEIGHTED_AVG(v, n)",
      cat).collect().head
    assert(out.getSeq[Long](0) == Seq(40L, 30L))
    assert(out.getSeq[String](1) == Seq("de", "en", "fr"))
    // weighted avg of v by n: (10*1.5+20*2.5+30*3.5+40*4.5)/(100) = 3.5
    assert(out.getDouble(2) == 3.5)
    // filtered TOP composes with the per-aggregate WHERE
    val ft = Esql.run(
      "FROM docs | STATS t = TOP(n, 2, \"asc\") WHERE lang == \"en\"",
      cat).collect().head.getSeq[Long](0)
    assert(ft == Seq(10L, 20L))
  }

  test("MATCH and QSTR full-text functions in WHERE") {
    val out = Esql.run(
      "FROM docs | WHERE MATCH(text, \"alpha gamma\") | KEEP id | SORT id",
      cat).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L)) // alpha in doc 1, gamma in doc 2
    val q = Esql.run(
      "FROM docs | WHERE QSTR(\"lang:de OR lang:fr\") | STATS c = COUNT(*)",
      cat).collect().head.getLong(0)
    assert(q == 2L)
  }

  test("filtered aggregates: AGG(x) WHERE cond is per-aggregate") {
    val out = Esql.run(
      "FROM docs | STATS all = COUNT(*), en = COUNT(*) WHERE lang == \"en\", " +
        "bign = SUM(n) WHERE n >= 30, m = MAX(v) WHERE lang != \"en\"",
      cat).collect().head
    assert(out.getLong(0) == 4L && out.getLong(1) == 2L)
    assert(out.getLong(2) == 70L && out.getDouble(3) == 4.5)
    // grouped form: the filter applies within each group independently
    val by = Esql.run(
      "FROM docs | STATS c = COUNT(*) WHERE n >= 20 BY lang | SORT lang",
      cat).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(by == Seq(("de", 1L), ("en", 1L), ("fr", 1L)))
  }

  test("ENRICH WITH keeps only the listed policy fields") {
    val dims = Seq(("en", "English", 1L), ("de", "German", 2L))
      .toDF("lang", "lang_name", "lang_rank")
    val out = Esql.run(
      "FROM docs | ENRICH dims ON lang WITH lang_name | WHERE id == 1 | KEEP id, lang_name",
      Map("docs" -> docs, "dims" -> dims)).collect().head
    assert(out.getString(1) == "English")
    assert(!Esql.run("FROM docs | ENRICH dims ON lang WITH lang_name",
      Map("docs" -> docs, "dims" -> dims)).columns.contains("lang_rank"))
    assert(intercept[IllegalArgumentException](
      Esql.run("FROM docs | ENRICH dims ON lang WITH nope",
        Map("docs" -> docs, "dims" -> dims)))
      .getMessage.contains("not in policy"))
  }

  test("FORK: branches run on the current frame, union with _fork") {
    val out = Esql.run(
      "FROM docs | FORK (WHERE lang == \"en\" | STATS c = COUNT(*)) " +
        "(SORT n DESC | LIMIT 1 | KEEP id) | SORT _fork",
      cat).collect()
    assert(out.length == 2)
    val f1 = out(0) // fork1: the count row
    assert(f1.getAs[String]("_fork") == "fork1" && f1.getAs[Long]("c") == 2L)
    val f2 = out(1) // fork2: top-n row, c null
    assert(f2.getAs[String]("_fork") == "fork2" && f2.getAs[Long]("id") == 4L)
    assert(f2.isNullAt(f2.fieldIndex("c")))
    assert(intercept[IllegalArgumentException](
      Esql.run("FROM docs | FORK (WHERE n > 1)", cat))
      .getMessage.contains("at least two"))
  }

  test("fail-loud: unknown command, unknown index, validate()") {
    assert(intercept[IllegalArgumentException](
      Esql.run("FROM docs | FROB x", cat)).getMessage.contains("unsupported"))
    assert(intercept[IllegalArgumentException](
      Esql.run("FROM nope", cat)).getMessage.contains("unknown index"))
    assert(Esql.validate("FROM docs | WHERE n > ", cat).isLeft)
    assert(Esql.validate("FROM docs | WHERE n > 1", cat).isRight)
  }

  test("NOW() pins to the provided anchor; arity is enforced") {
    import spark.implicits._
    val ev = Seq(("2024-01-30 00:00:00"), ("2024-01-25 12:00:00"))
      .toDF("s")
      .select(org.apache.spark.sql.functions.col("s")
        .cast("timestamp").as("ts"))
    val out = Esql.run(
        "FROM e | EVAL age = DATE_DIFF(\"days\", ts, NOW()) | KEEP age | SORT age",
        Map("e" -> ev),
        now = Some(java.time.Instant.parse("2024-02-01T00:00:00Z")))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 6L)) // 2 whole days and 6.5 → 6
    assert(intercept[IllegalArgumentException](Esql.run(
      "FROM e | EVAL x = NOW(ts)", Map("e" -> ev)))
      .getMessage.contains("0 argument"))
  }

  test("r12: STD_DEV is population; HASH algorithm is compile-time; " +
       "REPEAT/SPACE build strings") {
    val df = Seq(("a", 2.0), ("a", 4.0), ("b", 5.0)).toDF("k", "v")
    val out = Esql.run(
        "FROM t | STATS sd = STD_DEV(v) BY k " +
          "| EVAL h = HASH(\"sha256\", k), r = REPEAT(k, 3), " +
          "s = CONCAT(SPACE(1), k) | SORT k",
        Map("t" -> df))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getString(2), r.getString(3), r.getString(4)))
    // population std dev of {2,4} is 1.0 (sample would be ~1.414)
    assert(out(0) == (("a", 1.0,
      "ca978112ca1bbdcafac231b39a23dc4da786eff8147c4e72b9807785afee48bb",
      "aaa", " a")), out(0).toString)
    assert(out(1)._1 == "b" && out(1)._2 == 0.0)
    // an unsupported algorithm fails at COMPILE, not per row
    assert(intercept[IllegalArgumentException](Esql.run(
      "FROM t | EVAL h = HASH(\"crc32\", k)", Map("t" -> df)))
      .getMessage.contains("unsupported algorithm"))
  }

  test("r12: MEDIAN_ABSOLUTE_DEVIATION — exact per-group median pre-pass, " +
       "global form, scalar wrapping, WHERE refused") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 9.0),
      ("b", 5.0)).toDF("k", "v")
    // group a: median 3.0; |v-3| = {2,1,1,6} → median 1.5. group b: 0.
    val grouped = Esql.run(
        "FROM t | STATS m = MEDIAN_ABSOLUTE_DEVIATION(v) BY k | SORT k",
        Map("t" -> df))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(grouped == Seq(("a", 1.5), ("b", 0.0)), grouped.toString)
    // global (no BY), wrapped in a scalar, next to another aggregate —
    // all rows: median 4.0 wait: {1,2,4,9,5} median 4; |v-4|={3,2,0,5,1}
    // → median 2.0
    val global = Esql.run(
        "FROM t | STATS m = ROUND(MEDIAN_ABSOLUTE_DEVIATION(v), 2), " +
          "n = COUNT(*)",
        Map("t" -> df))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).head
    assert(global == ((2.0, 5L)), global.toString)
    // the _graft_mad_med_* helper column must not leak into the output
    val cols = Esql.run(
      "FROM t | STATS m = MEDIAN_ABSOLUTE_DEVIATION(v) BY k",
      Map("t" -> df)).columns.toSeq
    assert(cols == Seq("k", "m"), cols.toString)
    // per-aggregate WHERE cannot reach the median pre-pass — refuse it
    assert(intercept[IllegalArgumentException](Esql.run(
      "FROM t | STATS m = MEDIAN_ABSOLUTE_DEVIATION(v) WHERE v > 1 BY k",
      Map("t" -> df))).getMessage.contains("WHERE"))
  }

  test("r13: MAD with BY keeps the null-key group — and every other " +
       "aggregate in the STATS sees it too") {
    // the r12 meds attach was a using-columns inner join: null != null, so
    // the null-key group vanished from the WHOLE STATS output (COUNT
    // included), where the non-MAD path keeps it
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0),
      (None, 10.0), (None, 14.0), (None, 30.0)).toDF("k", "v")
    val out = Esql.run(
        "FROM t | STATS m = MEDIAN_ABSOLUTE_DEVIATION(v), n = COUNT(*) BY k",
        Map("t" -> df))
      .collect().map(r =>
        (if (r.isNullAt(0)) null else r.getString(0), r.getDouble(1),
          r.getLong(2))).toSeq.sortBy(_._3)
    // null group: median 14, |v-14| = {4,0,16} → MAD 4; count 3
    assert(out == Seq(("a", 1.0, 2L), (null, 4.0, 3L)), out.toString)
    // two BY keys, null in each position — the <=> condition is per-key
    val df2 = Seq((Some("a"), Some(1), 2.0), (Some("a"), Some(1), 6.0),
      (None, Some(1), 8.0), (Some("a"), None, 5.0)).toDF("k1", "k2", "v")
    val out2 = Esql.run(
        "FROM t | STATS m = MEDIAN_ABSOLUTE_DEVIATION(v) BY k1, k2",
        Map("t" -> df2))
      .collect().map(r => (r.getDouble(2))).toSeq.sorted
    assert(out2 == Seq(0.0, 0.0, 2.0), out2.toString)
  }

  test("r12: MV_PERCENTILE interpolates between closest ranks; " +
       "out-of-range p is null") {
    val df = Seq((1, Seq(4.0, 1.0, 3.0, 2.0))).toDF("id", "mv")
    def p(x: String) = Esql.run(
        s"FROM t | EVAL r = MV_PERCENTILE(mv, $x) | KEEP r", Map("t" -> df))
      .collect().head
    assert(p("50").getDouble(0) == 2.5)
    assert(p("0").getDouble(0) == 1.0)
    assert(p("100").getDouble(0) == 4.0)
    assert(p("75").getDouble(0) == 3.25)
    assert(p("101").isNullAt(0) && p("-1").isNullAt(0))
  }
}
