package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the 100 TB join strategy the doc store
  * uses when the search→row-load or doc-merge join is too big to
  * broadcast: write both sides bucketed on the join key and the join
  * needs no exchange at all. */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark

  test("joins between tables bucketed on the key run without a shuffle") {
    import spark.implicits._
    val docs = (1L to 5000L).map(i => (i, s"doc $i")).toDF("doc_id", "body")
    val meta = (1L to 5000L).map(i => (i, i % 7)).toDF("doc_id", "flags")
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_docs")
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_meta")
    // a crashed prior run can leave the managed location without the
    // catalog entry — clear it or CREATE TABLE refuses
    for (t <- Seq("graft_bucketed_docs", "graft_bucketed_meta")) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("graft_bucketed_docs")
    meta.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("graft_bucketed_meta")
    // disable broadcast so the plan shows the at-scale shape (at 100 TB
    // neither side fits in a broadcast anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucketed_docs")
        .join(spark.table("graft_bucketed_meta"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: no Exchange feeds the join — bucket layout IS the
      // partitioning, so a 100 TB join moves zero bytes across the network
      assert(!plan.contains("Exchange"), plan.take(1500))
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(joined.count() == 5000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
