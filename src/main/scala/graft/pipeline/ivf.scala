package graft.pipeline

import graft.functions.IvfFunctions.{nearest_centroid, probe_lists}
import graft.functions.VecFunctions.vec_cosine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the classic
  * coarse-quantizer scale path alongside [[Similarity.lshTopK]].
  *
  * Build: spherical k-means (deterministic seeding, a few Lloyd rounds) →
  * every corpus vector assigned to its nearest centroid's *inverted list*.
  * Probe: a query visits only its `nprobe` nearest lists.
  *
  * Scale shape: training touches the corpus `iters` times (one codegen'd
  * assignment pass + one small aggregate each); the centroid matrix
  * (C × dims doubles — model parameters, not data) rides the plan to
  * executors inside the assignment expressions. The assigned corpus can be
  * written `partitionBy("list_id")` so a probe reads only matching
  * partitions — at 100 TB that's the difference between a full scan and
  * touching nprobe/C of the data.
  */
object Ivf {

  /** Train centroids with spherical k-means. Deterministic: seeds are the
    * first `c` vectors in id order; `iters` Lloyd rounds. Returns the
    * normalized centroid matrix (each row unit length). */
  def train(corpus: DataFrame, c: Int, iters: Int = 3,
            idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val normed = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    var centroids = normed.orderBy("id").limit(c)
      .collect().map(r => normalize(r.getSeq[Double](1).toArray))
    var it = 0
    while (it < iters) {
      // assignment (expression pass) + per-dimension mean (one aggregate)
      val assigned = normed.withColumn("list_id", nearest_centroid(col("v"), centroids))
      val sums = assigned
        .select(col("list_id"), posexplode(col("v")))
        .groupBy(col("list_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val byList = sums.groupBy(_.getInt(0))
      centroids = centroids.indices.map { li =>
        byList.get(li) match {
          case Some(rows) =>
            val dims = rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
            normalize(Array.tabulate(dims.size)(i => dims(i)))
          case None => centroids(li) // empty list keeps its centroid
        }
      }.toArray
      it += 1
    }
    centroids
  }

  /** Assign every corpus vector to its inverted list. Write the result
    * `partitionBy("list_id")` to make probes partition-pruned. */
  def assign(corpus: DataFrame, centroids: Array[Array[Double]],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.withColumn("list_id",
      nearest_centroid(col(vecCol).cast("array<double>"), centroids))

  /** Materialized IVF index — the ANN layout of the store catalog: the
    * training pass (k-means over the corpus) and the assignment pass are
    * paid ONCE; every search after that reads the index and never scans
    * the corpus. Layout under `path`:
    *
    *   centroids  (list_id, centroid)     — C rows, collected+broadcast
    *                                        at serve time (model params)
    *   cells      the assigned corpus,    — a probe reads ONLY its
    *              partitionBy("list_id")    nprobe matching partitions
    *
    * The cells partitioning is the 100 TB point: serving filters on the
    * PARTITION column with literal probe ids, so the scan touches
    * ~nprobe/C of the data as directory pruning — never a full scan that
    * discards rows. Vectors are stored as `array<double>` so served
    * cosines are bit-identical to the in-memory path and the DuckDB
    * oracle. No append variant: centroids are a global argmax like the
    * BPE merges — corpus drift means retrain-and-version. */
  def writeIndex(corpus: DataFrame, c: Int, path: String, iters: Int = 3,
                 idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    val normed = corpus.withColumn(vecCol, col(vecCol).cast("array<double>"))
    val centroids = train(normed, c, iters, idCol, vecCol)
    spark.createDataFrame(centroids.toIndexedSeq.zipWithIndex
        .map { case (v, i) => (i, v.toIndexedSeq) })
      .toDF("list_id", "centroid")
      .coalesce(1).sort("list_id")
      .write.mode("overwrite").parquet(s"$path/centroids")
    assign(normed, centroids, idCol, vecCol)
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/cells")
  }

  /** Serve [[topK]] from a [[writeIndex]] store. The centroid table is
    * C-row-bounded (collected like the in-memory path's model); the probe
    * ids become a LITERAL `isin` on the cells' partition column, so the
    * scan is partition-pruned at planning time (PlanSpec pins the
    * PartitionFilters entry). With `nprobe` = C the read is exhaustive
    * and the result equals brute force exactly — the oracled twin; pruned
    * probes trade recall for reading nprobe/C of the index, the same
    * honest contract as the in-memory [[topK]]. */
  def topKFromStore(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, k: Int, nprobe: Int = 2,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    qIdCol: String = "query_id", qVecCol: String = "query_vec",
                    excludeSelf: Boolean = true): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("list_id").collect()
      .map(_.getSeq[Double](1).toArray)
    val probes = queries.select(col(qIdCol), col(qVecCol),
      explode(probe_lists(col(qVecCol).cast("array<double>"), centroids, nprobe))
        .as("list_id"))
    // literal partition predicate: queries are a bounded probe set by
    // contract (the broadcast below already assumes it), so collecting
    // their probe ids costs a queries×nprobe-sized plan-time job and buys
    // static directory pruning on the cells scan
    val probeIds = probes.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val cells = spark.read.parquet(s"$path/cells")
      .where(col("list_id").isin(probeIds: _*))
    val joined = cells.join(broadcast(probes), Seq("list_id"))
    val candidates =
      (if (excludeSelf) joined.where(col(idCol) =!= col(qIdCol)) else joined)
        .withColumn("cos", vec_cosine(col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol)).orderBy(desc("cos"), col(idCol))
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qIdCol), col(idCol).as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Probe: exact cosine top-k within the `nprobe` nearest lists per query. */
  def topK(assigned: DataFrame, queries: DataFrame,
           centroids: Array[Array[Double]], k: Int, nprobe: Int = 2,
           idCol: String = "vec_id", vecCol: String = "embedding",
           qIdCol: String = "query_id", qVecCol: String = "query_vec",
           excludeSelf: Boolean = true): DataFrame = {
    val probes = queries.select(col(qIdCol), col(qVecCol),
        explode(probe_lists(col(qVecCol).cast("array<double>"), centroids, nprobe))
          .as("list_id"))
    val joined = assigned.join(broadcast(probes), Seq("list_id"))
    val candidates = (if (excludeSelf) joined.where(col(idCol) =!= col(qIdCol)) else joined)
      .withColumn("cos", vec_cosine(col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol)).orderBy(desc("cos"), col(idCol))
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qIdCol), col(idCol).as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rank"))
  }
}
