package graft

import org.apache.spark.sql.SparkSession

/** Dev harness for the optimization rounds: time a NAMED subset of the
  * declared queries with the bench's own methodology (same session conf,
  * same warm-up, same `toRdd.count` action, median of N) without paying
  * for the full 376-query sweep — the focused A/B tool for one-change
  * measurements. NOT part of the driver contract (test scope; the real
  * bench is graft.Bench).
  * Usage: `Test/runMain graft.QuickBench <query>[,<query>...] [runs]` */
object QuickBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QuickBench <query>[,<query>...] [runs]")
    val names = args(0).split(',').toSeq
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the bench's warm-up, trimmed to the tables the subset touches most
    Seq("region", "lineitem", "documents", "embeddings", "events").foreach { t =>
      try {
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        df.select(df.columns.map(c =>
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.col(c)).as(c)): _*).collect()
      } catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"no query named '$name'"))
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply((ts.size - 1) / 2)
      println(f"QUICK $name%-32s median=$med%7.3f runs=${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
