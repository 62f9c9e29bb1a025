package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: measure index-served search vs the scan executor on a
  * prebuilt postings store (the steady-state shape — build cost amortizes
  * over every query ever run against the store, like any index).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.IndexBench'
  * Prints one JSON line: build time, then per-query scan vs indexed seconds
  * (median of 5 after 1 warm-up).
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_DOCS_REPL=k replicates the corpus k× (distinct doc_ids)
    // into a temp parquet, so the scan-vs-index crossover is measurable
    // beyond the fixture sizes; both paths read the same physical store
    val repl = sys.env.getOrElse("SPARK_GRAFT_DOCS_REPL", "1").toInt
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = if (repl <= 1) { base.count(); base } else {
      import org.apache.spark.sql.functions._
      val maxId = base.agg(max("doc_id")).head().getLong(0) + 1L
      val big = (0 until repl).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i.toLong * maxId)))
        .reduce(_.union(_))
      val path = java.nio.file.Files.createTempDirectory("graft_docs_repl").toString
      big.write.mode("overwrite").parquet(path)
      val d = spark.read.parquet(path)
      d.count()
      d
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_indexbench").toString
    val t0 = System.nanoTime()
    TextIndex.writePostings(
      TextIndex.buildPostings(docs, "doc_id", Seq("text", "lang"), 64), dir)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val store = spark.read.option("basePath", dir).parquet(dir)

    val queries = Seq(
      "q_term" -> "text:spark",                      // stop-word class: ~90% of docs
      "q_selective" -> "text:dup AND lang:de",       // ~5% × lang — the index case
      "q_bool" -> "text:spark OR text:batch",
      "q_wild" -> "text:filt* AND lang:de",
      "q_phrase" -> "text:\"query planner\"",
      "q_dsl" -> """{"query":{"bool":{"must":[{"match":{"text":"spark"}}],"must_not":[{"term":{"lang":"de"}}]}}}"""
    )
    def time(f: => Long): Double = {
      f // warm-up
      val runs = (1 to 5).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
      }.sorted
      runs(2)
    }
    val rows = queries.map { case (name, q) =>
      val scan = time(Search.search(docs, q, IndexConfig(), Seq("doc_id")).count())
      val idx = time(TextIndex.searchIndexed(docs, store, q, IndexConfig(),
        Seq("doc_id"), Set("text", "lang"), 64).count())
      // PK-only (load-rows=false): the scan path reads the corpus anyway;
      // the pure-index path answers from postings alone
      val pkq = s"#options:load-rows=false#$q"
      val scanPk = time(Search.search(docs, pkq, IndexConfig(), Seq("doc_id")).count())
      val purePk = time(TextIndex.searchIndexed(docs, store, pkq, IndexConfig(),
        Seq("doc_id"), Set("text", "lang"), 64, pureIndex = true).count())
      s""""$name":{"scan":$scan,"indexed":$idx,"scan_pk":$scanPk,"pure_pk":$purePk}"""
    }
    // aggregation crossover: the same terms-agg body over a selective
    // query, scan-filtered vs postings-candidate-pruned (Aggs.runIndexed)
    val aggBody = """{"query":{"match":{"text":"dup"}},
                      "aggs":{"by_lang":{"terms":{"field":"lang"},
                        "aggs":{"chars":{"avg":{"field":"n_chars"}}}}}}"""
    val aggScan = time(Aggs.runSingle(docs, aggBody).count())
    val aggIdx = time(Aggs.runIndexed(docs, store, aggBody,
      indexedFields = Set("text", "lang"), nBuckets = 64)("by_lang").count())
    println(s"""{"metric":"index_bench","sf":"$sfDir","repl":$repl,"build_sec":$buildSec,""" +
      s""""queries":{${rows.mkString(",")}},""" +
      s""""agg_terms":{"scan":$aggScan,"indexed":$aggIdx}}""")
    spark.stop()
  }
}
