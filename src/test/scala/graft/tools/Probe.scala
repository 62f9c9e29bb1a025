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
    // delete-sweep scaling: same fixed-size delete batch against a small
    // and a large keyed store — the r14 whole-ledger rewrite scaled with
    // the STORE; the bucketed sweep must scale with the batch's buckets
    val small = d.where(col("doc_id") < 2000)
    val ids = spark.range(10).select((col("id") * 97 + 3).as("doc_id"))
    for ((tag, corpus) <- Seq("small" -> small, "full" -> d)) {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_probe_sub_$tag").toString
      graft.pipeline.TextStats.writeNgramCountsKeyed(
        corpus, "text", "doc_id", 3, s"$path/ng")
      time(s"subtract-sweep-$tag") {
        graft.pipeline.TextStats.subtractNgramCounts(spark, s"$path/ng", ids)
      }
    }
    spark.stop()
  }
}
