package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for the NDJSON bulk path (BENCH r7 flagged a 10×
  * q_bulk_roundtrip regression). Times each stage of the round-trip in
  * isolation so serialization, parsing, and docId synthesis attribute
  * separately. */
object BulkProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("warm: scan count")(li.queryExecution.toRdd.count())
    val docs = li.select(
      DocModel.docId(Seq("l_orderkey"), Seq("l_linenumber")).as("doc_id"),
      col("l_returnflag"), col("l_linestatus"))
    time("docId projection")(docs.queryExecution.toRdd.count())
    val bulk = Indexer.toBulkNdjson(docs, "lineitem_index@").select("bulk")
    time("toBulkNdjson")(bulk.queryExecution.toRdd.count())
    time("toBulkNdjson again")(bulk.queryExecution.toRdd.count())
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("l_returnflag",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("l_linestatus",
        org.apache.spark.sql.types.StringType)))
    val rt = Indexer.fromBulkNdjson(bulk, schema)
    time("full roundtrip")(rt.queryExecution.toRdd.count())
    time("full roundtrip again")(rt.queryExecution.toRdd.count())
    // isolate: parse only (pre-serialized input)
    val mat = bulk.cache()
    time("materialize bulk")(mat.queryExecution.toRdd.count())
    val rt2 = Indexer.fromBulkNdjson(mat, schema)
    time("parse from cached")(rt2.queryExecution.toRdd.count())
    mat.unpersist()
    spark.stop()
  }
}
