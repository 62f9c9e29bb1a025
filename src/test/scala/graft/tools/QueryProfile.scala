package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time individual SparkEntry queries in isolation (same
  * action as Bench — materialize the plan with toRdd.count). Args: query
  * names; repeats each twice to separate JIT/IO warmup from steady state.
  * `SPARK_GRAFT_EXPLAIN=1` also prints the formatted plan. */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <query-name>...")
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
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"no query named '$name'"))
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).queryExecution.toRdd.count()
        println(f"PROFILE $name run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
      }
    }
    spark.stop()
  }
}
