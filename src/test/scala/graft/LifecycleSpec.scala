package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end index lifecycle over real fixture data (SURVEY §3.3):
  * build docs → segmented physical write → search the read-back store →
  * row-load join back to the source table → maintenance ops. */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  private val dir = "/root/testdata/sf0.001"
  private val now = java.sql.Timestamp.valueOf("2024-07-01 00:00:00")

  test("full lifecycle: build, write segmented, search, load rows, maintain") {
    val src = spark.read.parquet(s"$dir/orders.parquet")

    // 1. index creation (M1): doc build + segment column + partitioned write
    val docs = Indexer.buildDocs(src, Seq("o_orderkey"), Nil,
        IndexConfig(segment = SegmentGranularity.Month), now,
        segmentSource = Some("o_orderdate"))
      .withColumn("segment", date_format(col("segment"), "yyyy-MM"))
    val path = java.nio.file.Files.createTempDirectory("graft_lifecycle").toString
    docs.write.mode("overwrite").partitionBy("segment").parquet(path)

    // 2. the store is searchable after rebuild (reference: searchable while
    // building, IndexConfig.java:116-117)
    val store = spark.read.parquet(path)
    assert(store.count() == src.count())
    val hits = Search.search(store, "o_orderpriority:urgent AND o_orderstatus:o",
      IndexConfig(), Seq("doc_id"))
    assert(hits.count() > 0)

    // 3. row-load join back to the source (R9) with metadata (R10)
    val loaded = Search.loadRows(
      Search.withMeta(hits).select(col("doc_id").cast("long").as("o_orderkey"),
        col("_score"), col("hit_count")),
      src, Seq("o_orderkey"))
    assert(loaded.count() == hits.count())
    assert(loaded.columns.contains("o_totalprice")) // full source row restored

    // 4. segment TTL (M5) drops old partitions physically
    val before = store.select("segment").distinct().count()
    val dropped = Maintain.dropSegmentDirs(spark, path, "segment", _ >= "1998-01")
    assert(dropped.nonEmpty)
    val after = spark.read.parquet(path).select("segment").distinct().count()
    assert(after == before - dropped.length)

    // 5. upsert a mutation batch into the store (S3): doc content replaced
    val remaining = spark.read.parquet(path)
    val victim = remaining.select("doc_id").orderBy("doc_id").limit(1)
      .head.getString(0)
    val mutation = remaining.where(col("doc_id") === victim)
      .withColumn("o_orderpriority", lit("0-REINDEXED"))
      .withColumn("_v", lit(2L))
    val merged = Indexer.upsert(remaining.withColumn("_v", lit(1L)),
      mutation, "doc_id", Seq("_v"))
    assert(merged.count() == remaining.count())
    assert(merged.where(col("doc_id") === victim)
      .head.getAs[String]("o_orderpriority") == "0-REINDEXED")
  }
}
