package graft

/** Dev tool: record (or verify) a fixture-identity manifest.
  * `Test/runMain graft.ManifestGen <fixtureDir> <manifestPath>` writes;
  * with a 3rd arg `check` it verifies instead (exit 1 on mismatch). */
object ManifestGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ManifestGen <fixtureDir> <manifestPath> [check]")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 2 && args(2) == "check") {
      FixtureManifest.check(spark, args(0), args(1))
      println(s"MANIFEST_OK ${args(0)} matches ${args(1)}")
    } else {
      FixtureManifest.write(spark, args(0), args(1))
      println(s"MANIFEST_WRITTEN ${args(1)}")
    }
    spark.stop()
  }
}
