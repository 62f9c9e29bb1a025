package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness: `runMain graft.TimeQuery <sfDir>
  * <query>...` runs each named SparkEntry query with the Bench session
  * config and prints `TIME <name> <sec>` — the iteration loop for plan
  * tuning without paying for the full bench sweep. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <query>...")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        println(f"TIME $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
