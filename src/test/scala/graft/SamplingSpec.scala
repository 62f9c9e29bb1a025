package graft

import graft.pipeline.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic splitting/sampling: disjoint cover, fraction accuracy,
  * seed stability, join-stability across tables. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private def ids = (0L until 10000L).toDF("id")

  test("splits are a disjoint cover with ~the requested weights") {
    val splits = Sampling.split(ids, Seq("id"), Seq(0.8, 0.1, 0.1), seed = 7L)
    val counts = splits.map(_.count())
    assert(counts.sum == 10000L) // cover, no dup, no loss
    assert(math.abs(counts(0) - 8000L) < 300, counts.toString)
    assert(math.abs(counts(1) - 1000L) < 150, counts.toString)
    assert(math.abs(counts(2) - 1000L) < 150, counts.toString)
    // disjoint: no id in two splits
    val inter = splits(0).join(splits(1), "id").count() +
      splits(0).join(splits(2), "id").count() +
      splits(1).join(splits(2), "id").count()
    assert(inter == 0)
  }

  test("same seed → identical assignment; different seed → different") {
    val a = Sampling.deterministicSample(ids, Seq("id"), 0.3, seed = 1L)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(ids, Seq("id"), 0.3, seed = 1L)
      .collect().map(_.getLong(0)).toSet
    val c = Sampling.deterministicSample(ids, Seq("id"), 0.3, seed = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a != c)
    assert(math.abs(a.size - 3000) < 200)
  }

  test("sampling is join-stable: the same keys survive in every table") {
    val left = ids.withColumn("payload", col("id") * 2)
    val right = ids.withColumn("other", col("id") + 1)
    val ls = Sampling.deterministicSample(left, Seq("id"), 0.2, seed = 9L)
    val rs = Sampling.deterministicSample(right, Seq("id"), 0.2, seed = 9L)
    assert(ls.count() == rs.count())
    assert(ls.join(rs, "id").count() == ls.count()) // identical key sets
  }

  test("sample pushes down as a scan filter — no shuffle, no state") {
    val plan = Sampling.deterministicSample(ids, Seq("id"), 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("globalShuffle: a seed-keyed permutation — same rows, scrambled " +
       "order, reproducible; epoch reshuffle is a seed change") {
    val shuffled = Sampling.globalShuffle(ids, Seq("id"), seed = 3L,
      numPartitions = 4)
    val rows = shuffled.select("id").collect().map(_.getLong(0))
    assert(rows.sorted.toSeq == (0L until 10000L).toSeq) // permutation
    assert(rows.take(100).toSeq != (0L until 100L).toSeq) // actually scrambled
    val again = Sampling.globalShuffle(ids, Seq("id"), seed = 3L,
      numPartitions = 4).select("id").collect().map(_.getLong(0))
    assert(rows.toSeq == again.toSeq) // reproducible from the seed alone
    val epoch2 = Sampling.globalShuffle(ids, Seq("id"), seed = 4L,
      numPartitions = 4).select("id").collect().map(_.getLong(0))
    assert(rows.toSeq != epoch2.toSeq) // new epoch, new order
  }

  test("globalShuffle plan: range exchange + within-partition sort, " +
       "never a single-partition global sort") {
    val plan = Sampling.globalShuffle(ids, Seq("id"), seed = 1L,
      numPartitions = 4).queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(800))
    assert(!plan.contains("SinglePartition"), plan.take(800))
    // the Sort node must be within-partition (global=false)
    assert(!plan.matches("(?s).*Sort \\[[^\\]]*\\], true.*"), plan.take(800))
  }
}
