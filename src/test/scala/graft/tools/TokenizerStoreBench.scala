package graft.tools

import org.apache.spark.sql.functions._

/** Measures the tokenizer store's actual claim — "the training pass is
  * paid once; serving never re-pays it" — at a REAL merge count (the
  * driver pair q_tokenize_ids/_store runs 8 toy merges, where training
  * is too cheap for the store to show: the r12 README flags exactly
  * that). Median-of-3 for both sides:
  *
  *   direct = Bpe.train(corpus, merges) + encodeToIds   (per query)
  *   serve  = Bpe.encodeToIdsFromStore                  (store built once)
  *
  * Usage: Test/runMain graft.tools.TokenizerStoreBench <sfDir> [merges]
  * Prints one JSON line; numbers land in COVERAGE.md's tokenizer-store
  * catalog row. */
object TokenizerStoreBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val merges = args.lift(1).map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(count(col("text"))).collect() // warm pages
    def med(runs: Int)(body: => Long): (Double, Long) = {
      val timed = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (timed.map(_._1).sorted.apply((runs - 1) / 2), timed.head._2)
    }
    val (directSec, nDirect) = med(3) {
      val m = graft.pipeline.Bpe.train(docs, "text", merges)
      graft.pipeline.Bpe.encodeToIds(docs, "doc_id", "text", m)
        .queryExecution.toRdd.count()
    }
    val store = java.nio.file.Files.createTempDirectory("graft_tok_bench").toString
    val t0 = System.nanoTime()
    graft.pipeline.Bpe.writeTokenizer(docs, "text", merges, store)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val (serveSec, nServe) = med(3) {
      graft.pipeline.Bpe.encodeToIdsFromStore(docs, "doc_id", "text", store)
        .queryExecution.toRdd.count()
    }
    require(nDirect == nServe, s"row mismatch: $nDirect vs $nServe")
    println(f"""{"merges":$merges,"rows":$nDirect,"direct_sec":$directSec%.3f,""" +
      f""""store_build_sec":$buildSec%.3f,"serve_sec":$serveSec%.3f,""" +
      f""""direct_over_serve":${directSec / serveSec}%.2f,"sf":"$dir"}""")
    spark.stop()
  }
}
