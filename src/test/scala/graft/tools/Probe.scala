package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for optimization-round diagnostics (test scope). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.count() // warm
    // decomposition of q_search_bm25_indexed
    time("postings-build-all") {
      TextIndex.buildPostings(d, "doc_id", Seq("text"), 16)
        .queryExecution.toRdd.count()
    }
    time("postings-probe-only") {
      val p = TextIndex.buildPostings(d, "doc_id", Seq("text"), 16)
      p.where(col("token").isin("spark", "query")).queryExecution.toRdd.count()
    }
    time("norms-build") {
      TextIndex.buildNorms(d, "doc_id", Seq("text"))
        .queryExecution.toRdd.count()
    }
    time("bm25-indexed-full") {
      val p = TextIndex.buildPostings(d, "doc_id", Seq("text"), 16)
      val n = TextIndex.buildNorms(d, "doc_id", Seq("text"))
      TextIndex.bm25Indexed(p, n, "text", Seq("spark", "query"), nBuckets = 16)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
