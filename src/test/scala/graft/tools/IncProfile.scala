package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the incremental-dedup pieces. */
object IncProfile {
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $label ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { i =>
      val path = java.nio.file.Files.createTempDirectory(s"inc_prof$i").toString + "/st"
      t(s"write_store_$i") {
        pipeline.Dedup.writeSketchStore(docs.where(col("doc_id") < 300), path, "text", "doc_id")
      }
      val pairs = t(s"plan_$i") {
        pipeline.Dedup.minhashPairsIncremental(spark, path,
          docs.where(col("doc_id") >= 300), "text", "doc_id")
      }
      t(s"exec_$i") { pairs.queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
