package graft

import graft.pipeline.{Ivf, Pq, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN: encode determinism, lossless-config exactness
  * vs brute force, approximation recall, and the no-corpus-shuffle plan. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  // deterministic 8-dim corpus: two tight clusters + an outlier; doc 0/1
  // and 10/11 are near-twins so top-1 neighbors are unambiguous
  private def corpus = Seq(
    (0L, Array(1.0, 0.9, 0.0, 0.1, 0.0, 0.0, 0.1, 0.0)),
    (1L, Array(0.9, 1.0, 0.1, 0.0, 0.0, 0.1, 0.0, 0.0)),
    (2L, Array(1.0, 0.8, 0.1, 0.1, 0.1, 0.0, 0.0, 0.1)),
    (10L, Array(0.0, 0.1, 1.0, 0.9, 0.1, 0.0, 0.0, 0.0)),
    (11L, Array(0.1, 0.0, 0.9, 1.0, 0.0, 0.1, 0.0, 0.0)),
    (12L, Array(0.0, 0.0, 1.0, 0.7, 0.0, 0.0, 0.1, 0.1)),
    (20L, Array(0.0, 0.0, 0.0, 0.0, 0.9, 1.0, 0.8, 0.7)))
    .toDF("vec_id", "embedding")

  private def queriesOf(df: org.apache.spark.sql.DataFrame, ids: Long*) =
    df.where(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  test("encode: codes are per-subspace indices in range, deterministic") {
    val cb = Pq.train(corpus, m = 4, ksub = 3, iters = 2)
    assert(cb.length == 4 && cb.forall(_.length <= 3) && cb.forall(_.forall(_.length == 2)))
    val codes = Pq.encode(corpus, cb).select("vec_id", "code")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 3)))
    val again = Pq.encode(corpus, Pq.train(corpus, m = 4, ksub = 3, iters = 2))
      .select("vec_id", "code").collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes == again)
  }

  test("lossless config (ksub >= distinct subvectors) reproduces brute force exactly") {
    // 7 vectors, ksub = 8: every distinct subvector is its own centroid, so
    // ADC == exact cosine and the whole train->encode->score machinery is
    // pinned end-to-end (iters = 0: seeds already saturate)
    val cb = Pq.train(corpus, m = 4, ksub = 8, iters = 0)
    val enc = Pq.encode(corpus, cb)
    val qs = queriesOf(corpus, 0L, 10L, 20L)
    val pq = Pq.adcTopK(enc, qs, cb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val exact = Similarity.bruteForceTopK(
        corpus.withColumn("embedding", col("embedding").cast("array<double>")), qs, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(pq == exact)
  }

  test("lossy config still finds the planted twin as top-1") {
    val cb = Pq.train(corpus, m = 4, ksub = 2, iters = 2)
    val top1 = Pq.adcTopK(Pq.encode(corpus, cb), queriesOf(corpus, 0L, 10L), cb, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // twins quantize to the same cells, so ADC cannot rank them below
    // cross-cluster vectors even at ksub = 2
    assert(Set(1L, 2L).contains(top1(0L)), s"got $top1")
    assert(Set(11L, 12L).contains(top1(10L)), s"got $top1")
  }

  test("ivf-pq composition: pruned probe + ADC scoring agrees with ADC on the probed lists") {
    val cb = Pq.train(corpus, m = 4, ksub = 8, iters = 0)
    val centroids = Ivf.train(corpus, c = 2, iters = 2)
    val assigned = Pq.encode(Ivf.assign(corpus, centroids), cb)
    val qs = queriesOf(corpus, 0L)
    val out = Pq.ivfPqTopK(assigned, qs, centroids, cb, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // nprobe = C = 2 visits everything -> equals plain ADC top-k (lossless
    // codebook -> equals brute force)
    val full = Pq.adcTopK(Pq.encode(corpus, cb), qs, cb, k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == full.toSeq)
  }

  test("r13: the materialized IVF-PQ index serves searches equal to the " +
       "in-memory composition from code-only, partition-pruned cells") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    Pq.writeIvfPqIndex(corpus, c = 2, m = 4, path, ksub = 8,
      pqIters = 1, ivfIters = 2)
    val qs = queriesOf(corpus, 0L, 10L)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // served == the in-memory composition on the same deterministic models
    val cb = Pq.train(corpus, m = 4, ksub = 8, iters = 1)
    val centroids = Ivf.train(corpus, c = 2, iters = 2)
    val assigned = Pq.encode(Ivf.assign(corpus, centroids), cb)
    assert(pairs(Pq.ivfPqTopKFromStore(spark, path, qs, k = 3, nprobe = 1)) ==
      pairs(Pq.ivfPqTopK(assigned, qs, centroids, cb, k = 3, nprobe = 1)))
    assert(pairs(Pq.ivfPqTopKFromStore(spark, path, qs, k = 3, nprobe = 2)) ==
      pairs(Pq.ivfPqTopK(assigned, qs, centroids, cb, k = 3, nprobe = 2)))
    // the compression point: cells persist codes ONLY — no float vectors
    val cellCols = spark.read.parquet(s"$path/cells").columns.toSet
    assert(cellCols == Set("list_id", "vec_id", "code"), cellCols.toString)
    // and the pruned probe's scan carries a literal partition filter
    val scans = Pq.ivfPqTopKFromStore(spark, path, qs, k = 3, nprobe = 1)
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scans.contains("PartitionFilters") && scans.contains("list_id"),
      scans.take(1500))
  }

  test("r13: IVF-PQ store maintenance cycle — delete → compact → re-append " +
       "under frozen models serves exactly brute force again (lossless config)") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_cyc").toString
    // lossless codebooks trained on the FULL corpus: any row that leaves
    // and returns re-encodes to the identical codes
    Pq.writeIvfPqIndex(corpus, c = 2, m = 4, path, ksub = 8,
      pqIters = 0, ivfIters = 2)
    val qs = queriesOf(corpus, 0L, 10L)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    Ivf.deleteFromIndex(spark, path,
      corpus.where(col("vec_id").isin(2L, 12L)).select("vec_id"))
    // tombstones filter the served codes immediately
    val survivors = corpus.where(!col("vec_id").isin(2L, 12L))
      .withColumn("embedding", col("embedding").cast("array<double>"))
    assert(pairs(Pq.ivfPqTopKFromStore(spark, path, qs, k = 3, nprobe = 2)) ==
      pairs(Similarity.bruteForceTopK(survivors, qs, k = 3)))
    val (removed, _) = Maintain.compactAnnIndex(spark, path)
    assert(removed == 2L)
    // cells stay code-only through the compaction swap
    assert(spark.read.parquet(s"$path/cells").columns.toSet ==
      Set("list_id", "vec_id", "code"))
    Pq.appendToIvfPqIndex(spark, path, corpus.where(col("vec_id").isin(2L, 12L)))
    assert(pairs(Pq.ivfPqTopKFromStore(spark, path, qs, k = 3, nprobe = 2)) ==
      pairs(Similarity.bruteForceTopK(
        corpus.withColumn("embedding", col("embedding").cast("array<double>")),
        qs, k = 3)))
  }

  test("r13: versioned IVF-PQ root — retrain rebuilds BOTH models beside " +
       "the serving version; the shared pointer/prune verbs apply") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_ver").toString
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val qs = queriesOf(corpus, 0L, 10L)
    // v1: models trained on the first cluster only (lossless for it)
    Pq.writeVersionedIvfPqIndex(corpus.where(col("vec_id") < 10), c = 2,
      m = 4, root, ksub = 8, pqIters = 0, ivfIters = 2)
    assert(Ivf.currentVersion(spark, root).contains(1))
    // retrain on the FULL corpus: lossless codebooks + exhaustive probe
    // through the new version equal brute force
    assert(Pq.retrainIvfPqIndex(corpus, c = 2, m = 4, root, ksub = 8,
      pqIters = 0, ivfIters = 2) == 2)
    assert(pairs(Pq.ivfPqTopKFromVersionedStore(spark, root, qs, k = 3,
        nprobe = 2)) ==
      pairs(Similarity.bruteForceTopK(
        corpus.withColumn("embedding", col("embedding").cast("array<double>")),
        qs, k = 3)))
    // the shared GC reclaims v1, never the current version
    assert(Maintain.pruneIndexVersions(spark, root) == Seq(1))
    assert(!new java.io.File(s"$root/v1").exists())
    assert(spark.read.parquet(s"$root/v2/cells").columns.toSet ==
      Set("list_id", "vec_id", "code"))
  }

  test("plan: corpus side is never shuffled before scoring; queries broadcast") {
    val cb = Pq.train(corpus, m = 4, ksub = 4, iters = 1)
    val plan = Pq.adcTopK(Pq.encode(corpus, cb), queriesOf(corpus, 0L), cb, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
    // the only exchange is the bounded per-query top-k window partitioning
    assert(plan.split("Exchange").length - 1 <= 2, plan)
  }

  test("ragged codebooks (skewed per-subspace distinct counts) stay lossless") {
    // every vector shares the SAME first subspace but differs in the
    // second: subspace 0 saturates at 1 centroid while subspace 1 needs 4.
    // Before codebook padding, the ADC lookup table used subspace 0's
    // length as the uniform stride and subspace 1 wrote past the end.
    val skewed = Seq(
      (1L, Array(1.0, 0.0, 1.0, 0.0)),
      (2L, Array(1.0, 0.0, 0.0, 1.0)),
      (3L, Array(1.0, 0.0, 0.7, 0.7)),
      (4L, Array(1.0, 0.0, 0.3, 0.9)))
      .toDF("vec_id", "embedding")
    val cb = Pq.train(skewed, m = 2, ksub = 8, iters = 0)
    assert(cb(0).length == cb(1).length) // padded to a uniform width
    val qs = queriesOf(skewed, 1L)
    val pq = Pq.adcTopK(Pq.encode(skewed, cb), qs, cb, k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val exact = Similarity.bruteForceTopK(
        skewed.withColumn("embedding", col("embedding").cast("array<double>")), qs, k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(pq == exact)
  }

  test("caller-supplied ragged codebooks fail loud, not corrupt scores") {
    // Pq.train pads to uniform width, but encode/adcTopK are public and the
    // ADC LUT stride is subspace 0's length — a wider later subspace wrote
    // into the adjacent subspace's region (silent score corruption)
    val ragged: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0)),                       // subspace 0: 1 centroid
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))      // subspace 1: 2 centroids
    val data = Seq((1L, Array(1.0, 0.0, 0.0, 1.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Pq.encode(data, ragged).collect())
    assert(e.getMessage.contains("ragged"))
    val e2 = intercept[IllegalArgumentException](
      Pq.adcTopK(Pq.encode(data, Pq.train(data, m = 2, ksub = 2, iters = 0)),
        queriesOf(data, 1L), ragged, k = 1).collect())
    assert(e2.getMessage.contains("ragged"))
  }

  test("zero vectors never outrank real neighbors (normalize guard)") {
    val withZero = corpus.union(Seq((99L, Array.fill(8)(0.0))).toDF("vec_id", "embedding"))
    val cb = Pq.train(withZero, m = 4, ksub = 8, iters = 0)
    val top = Pq.adcTopK(Pq.encode(withZero, cb), queriesOf(withZero, 0L), cb, k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(!top.contains(99L))
  }
}
