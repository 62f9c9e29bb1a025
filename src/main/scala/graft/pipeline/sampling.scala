package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines (north-star surface; the reference has no sampling concept).
  *
  * Everything is hash-based and seed-parameterized — no `rand()`: a split
  * must assign the same row to the same side across retries, resumed runs,
  * and cluster sizes, or downstream training silently leaks eval data.
  * `xxhash64(id…, seed)` evaluates inside whole-stage codegen at the scan,
  * so a split/sample is a pushdown-friendly narrow filter: no shuffle, no
  * sort, no state.
  */
object Sampling {

  private val Buckets = 1000000L // hash-bucket resolution: 1e-6 granularity

  private def bucket(idCols: Seq[String], seed: Long): Column =
    pmod(xxhash64(idCols.map(col) :+ lit(seed): _*), lit(Buckets))

  /** Split-index column: weights (need not sum to 1; normalized) map hash
    * buckets to contiguous ranges — split `i` gets `weights(i)` of the key
    * space. Same (ids, seed) → same assignment, forever. */
  def splitColumn(idCols: Seq[String], weights: Seq[Double], seed: Long = 0L): Column = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val cuts = weights.scanLeft(0.0)(_ + _).map(w => (w / total * Buckets).toLong)
    val b = bucket(idCols, seed)
    // split i owns buckets [cuts(i), next lower bound); only lower bounds
    // matter — the chained `when(b >= lo, i)` with the LAST matching bound
    // winning is open-ended upward, so the tail bucket can never be dropped
    cuts.init.zipWithIndex.tail.foldLeft(lit(0)) { case (acc, (lo, i)) =>
      when(b >= lo, i).otherwise(acc)
    }
  }

  /** Materialized splits in declared order (e.g. train/val/test). */
  def split(df: DataFrame, idCols: Seq[String], weights: Seq[Double],
            seed: Long = 0L): Seq[DataFrame] = {
    val c = splitColumn(idCols, weights, seed)
    weights.indices.map(i => df.where(c === i))
  }

  /** Deterministic fraction sample: keeps rows whose hash bucket falls
    * below `fraction` of the key space. Repeatable, join-stable (the same
    * ids are kept in every table sampled with the same seed — enables
    * consistent multi-table downsampling). */
  def deterministicSample(df: DataFrame, idCols: Seq[String], fraction: Double,
                          seed: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.where(bucket(idCols, seed) < (fraction * Buckets).toLong)
  }
}
