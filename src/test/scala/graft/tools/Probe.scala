package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for optimization-round diagnostics (test scope). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(DocModel.docId(Seq("l_orderkey"), Seq("l_linenumber")).as("doc_id"),
        col("l_returnflag"), col("l_linestatus"))
    println("NDJSON-INPUT-STATS " + sfDir + " = " +
      li.queryExecution.optimizedPlan.stats.sizeInBytes)
    // does the verify semi-join push below the shingle projection?
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.pipeline.Dedup.minhashPairs(docs, "text", "doc_id")
    println("MINHASH-PLAN:")
    println(pairs.queryExecution.executedPlan.toString.take(9000))
    spark.stop()
  }
}
