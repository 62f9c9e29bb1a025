package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline; query set broadcast
  *    against the corpus, one scan, no shuffle of the corpus;
  *  - random-hyperplane LSH — the scale path: bucket corpus and queries by
  *    sign-bit signatures, search only within shared bucket bands.
  *
  * Dot products are pure `zip_with`/`aggregate` higher-order expressions —
  * no UDFs, so the whole scan stays codegen-friendly.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a single expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** ‖v‖₂ */
  def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector.
    *
    * `queries` (small: a handful of probe vectors) is broadcast-cross-joined
    * against the corpus — the corpus is scanned once, never shuffled; the
    * only shuffle is the final per-query top-k (k rows per query). At 100 TB
    * this is the right baseline shape: cost is one full scan, and the
    * `Window`+`row_number` top-k is bounded by |queries|·k.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     qIdCol: String = "query_id", qVecCol: String = "query_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .where(col(idCol) =!= col(qIdCol))
      .withColumn("cos", cosine(col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(desc("cos"), col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qIdCol), col(idCol).as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Random-hyperplane signature: bit b = sign(v · h_b) where hyperplane
    * h_b is a deterministic pseudo-random ±1 vector derived from
    * xxhash64(dimension, bit) — reproducible across runs with no RNG state. */
  def rhpSignature(vec: Column, bits: Int): Column =
    array(Seq.tabulate(bits) { b =>
      val proj = aggregate(zip_with(vec,
          transform(sequence(lit(0), size(vec) - 1),
            i => when(xxhash64(i, lit(b)).bitwiseAND(1) === 0, 1.0d).otherwise(-1.0d)),
          (x, h) => x * h),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, 1).otherwise(0)
    }: _*)

  /** Approximate top-k via LSH banding: corpus and queries hashed to
    * `bands` buckets of `bitsPerBand` sign bits; candidate set = union of
    * shared buckets; exact cosine ranks candidates. Recall grows with bands;
    * cost is proportional to bucket collision volume, not corpus size ×
    * query count. The 100 TB path: bucketed corpus can be written
    * pre-partitioned by (band, bucket) so probes touch only matching
    * partitions. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bands: Int = 4, bitsPerBand: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qIdCol: String = "query_id", qVecCol: String = "query_vec"): DataFrame = {
    val bits = bands * bitsPerBand
    def banded(df: DataFrame, id: String, vec: String, pfx: String) =
      df.withColumn("_sig", rhpSignature(col(vec), bits))
        .select(col(id), col(vec),
          posexplode(array(Seq.tabulate(bands) { b =>
            concat_ws(",", slice(col("_sig"), b * bitsPerBand + 1, bitsPerBand))
          }: _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
        .withColumnRenamed(id, s"$pfx$id").withColumnRenamed(vec, s"$pfx$vec")
    val c = banded(corpus, idCol, vecCol, "")
    val q = banded(queries, qIdCol, qVecCol, "")
    val candidates = c.join(broadcast(q), Seq("band", "bucket"))
      .where(col(idCol) =!= col(qIdCol))
      .dropDuplicates(qIdCol, idCol)
      .withColumn("cos", cosine(col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol)).orderBy(desc("cos"), col(idCol))
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qIdCol), col(idCol).as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (the fifth dedup strategy —
    * see [[Dedup]]): all pairs with cosine ≥ threshold, candidates from
    * shared LSH buckets, verified exactly. */
  def cosinePairs(df: DataFrame, threshold: Double,
                  bands: Int = 8, bitsPerBand: Int = 4,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bits = bands * bitsPerBand
    val banded = df.withColumn("_sig", rhpSignature(col(vecCol), bits))
      .select(col(idCol), col(vecCol),
        posexplode(array(Seq.tabulate(bands) { b =>
          concat_ws(",", slice(col("_sig"), b * bitsPerBand + 1, bitsPerBand))
        }: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"),
      col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = banded.select(col("band"), col("bucket"),
      col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
