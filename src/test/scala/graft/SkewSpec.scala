package graft

import graft.pipeline.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("salted join equals plain join on skewed keys") {
    val large = (1 to 1000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i))
      .toDF("k", "v") // 90% of rows share one key
    val small = Seq(("HOT", "hot-payload"), ("cold10", "c10")).toDF("k", "p")
    val plain = large.join(small, Seq("k")).agg(count(lit(1)), sum("v")).head
    val salted = Skew.saltedJoin(large, small, Seq("k"), saltFactor = 8)
      .agg(count(lit(1)), sum("v")).head
    assert(plain == salted)
  }

  test("adaptive salted join: hot keys spread across tasks, output invariant") {
    val large = ((1 to 2000).map(i => ("HOT", i)) ++
      (1 to 50).map(i => ("c" + i, i))).toDF("k", "v")
    val small = (Seq("HOT") ++ (1 to 50).map("c" + _))
      .map(k => (k, "p-" + k)).toDF("k", "p")
    val plain = large.join(small, Seq("k")).agg(count(lit(1)), sum("v")).head
    val salted = Skew.adaptiveSaltedJoin(large, small, Seq("k"),
      hotAt = 100, saltFactor = 8)
    assert(salted.agg(count(lit(1)), sum("v")).head == plain)
    // force the main join through a shuffle (the broadcast(hot) hint
    // inside stays) and check the hot key's rows now span >1 reducer —
    // the plain shuffle join would put all 2000 on one
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE would coalesce this test-sized shuffle to one partition and mask
    // the spread; at scale coalescing keeps partitions at the size target
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val spread = Skew.adaptiveSaltedJoin(large, small, Seq("k"),
          hotAt = 100, saltFactor = 8)
        .where(col("k") === "HOT")
        .select(spark_partition_id().as("pid")).distinct().count()
      assert(spread > 1, s"hot key stayed on $spread partition(s)")
      val unsalted = large.join(small, Seq("k"))
        .where(col("k") === "HOT")
        .select(spark_partition_id().as("pid")).distinct().count()
      assert(unsalted == 1, s"control: plain join spread $unsalted")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    }
  }

  test("adaptive salted join: below-threshold keys salt to 0 — plan " +
       "equivalent to unsalted on balanced data") {
    val large = (1 to 300).map(i => ("k" + (i % 30), i)).toDF("k", "v")
    val small = (0 until 30).map(i => ("k" + i, i)).toDF("k", "p")
    val out = Skew.adaptiveSaltedJoin(large, small, Seq("k"),
      hotAt = 1000, saltFactor = 8).collect()
    val ref = large.join(small, Seq("k")).collect()
    assert(out.map(_.toString).sorted.toSeq == ref.map(_.toString).sorted.toSeq)
  }

  test("minhashPairs is salt-invariant on a pathological near-identical corpus") {
    import graft.pipeline.Dedup
    // 300 docs over 7 near-identical templates: every doc collides with
    // ~1/7 of the corpus in every band — the boilerplate-crawl shape
    val docs = (1 to 300).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog variant ${i % 7}"))
      .toDF("doc_id", "text")
    val base = Dedup.minhashPairs(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(base.nonEmpty)
    spark.conf.set("graft.skew.saltAt", "20")
    spark.conf.set("graft.skew.saltFactor", "4")
    try {
      val salted = Dedup.minhashPairs(docs, "text", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(salted == base)
    } finally {
      spark.conf.unset("graft.skew.saltAt")
      spark.conf.unset("graft.skew.saltFactor")
    }
  }

  test("cosinePairs is salt-invariant with salting forced on") {
    import graft.pipeline.Similarity
    val vecs = (1 to 60).map { i =>
      val base = Array.tabulate(8)(d => if (d == i % 3) 1.0f else 0.01f * d)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val base = Similarity.cosinePairs(vecs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(base.nonEmpty)
    spark.conf.set("graft.skew.saltAt", "1")
    spark.conf.set("graft.skew.saltFactor", "4")
    try {
      val salted = Similarity.cosinePairs(vecs, 0.9, reduceCandidates = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(salted == base)
    } finally {
      spark.conf.unset("graft.skew.saltAt")
      spark.conf.unset("graft.skew.saltFactor")
    }
  }

  test("salted count equals plain count") {
    val df = (1 to 500).map(i => ("k" + (i % 3), i)).toDF("k", "v")
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, Seq("k"), saltFactor = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }
}
