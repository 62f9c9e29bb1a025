package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dataset scale-up: replicate an sf directory N× with
  * key-space shifts, for bench sanity points above the largest driver-
  * provided scale (a quadratic term invisible at sf0.1 shows at sf1).
  *
  * Replica `i` shifts every key column by `i * (max_key + 1)` so
  * intra-replica joins stay valid (lineitem↔orders↔customer, etc.) and key
  * cardinality scales with volume — sessions stay session-sized, doc ids
  * stay unique. Two structure-preserving tweaks keep the scaled corpus
  * REALISTIC instead of a clone farm that would quadratically explode
  * every dedup query:
  *
  *  - `documents.text`: every token gets a replica suffix (`_rI`) — a
  *    bijective token rename, so per-replica shingle/Jaccard structure is
  *    EXACTLY the original's, while cross-replica similarity is zero;
  *  - `embeddings.embedding`: replica vectors are rotated by `i`
  *    positions — norm and coordinate distribution preserved,
  *    cross-replica cosine decorrelated.
  *
  * `region`/`nation` stay single-copy (TPC-H does not scale fixed dims).
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <outDir> <factor>`
  */
object ScaleUp {

  private def shifted(df: DataFrame, keys: Seq[String], factor: Int)
                     (tweak: (DataFrame, Int) => DataFrame): DataFrame = {
    val maxes = keys.map(k => k ->
      (df.agg(max(col(k))).head.getLong(0) + 1L)).toMap
    (0 until factor).map { i =>
      val shiftedKeys = keys.foldLeft(df) { (d, k) =>
        d.withColumn(k, col(k) + lit(i * maxes(k)))
      }
      tweak(shiftedKeys, i)
    }.reduce(_.unionByName(_))
  }

  private val identity: (DataFrame, Int) => DataFrame = (d, _) => d

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <outDir> <factor>")
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(shifted(read("customer"), Seq("c_custkey"), factor)(identity), "customer")
    write(shifted(read("supplier"), Seq("s_suppkey"), factor)(identity), "supplier")
    write(shifted(read("part"), Seq("p_partkey"), factor)(identity), "part")
    write(shifted(read("orders"), Seq("o_orderkey", "o_custkey"), factor)(identity), "orders")
    write(shifted(read("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"), factor)(identity), "lineitem")
    write(shifted(read("events"), Seq("event_id", "user_id"), factor)(identity), "events")
    write(shifted(read("documents"), Seq("doc_id"), factor) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_r$i"))
    }, "documents")
    write(shifted(read("embeddings"), Seq("vec_id"), factor) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding", expr(
        s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
          s"slice(embedding, 1, $i))"))
    }, "embeddings")
    spark.stop()
  }
}
