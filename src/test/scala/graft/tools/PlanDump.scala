package graft

import org.apache.spark.sql.SparkSession

/** Dev harness for the optimization rounds: write each named query's
  * `.explain("formatted")` output to `<outDir>/<query>_<tag>.txt` in one
  * JVM — the before/after plan evidence the round's writeup commits.
  * Usage: `Test/runMain graft.PlanDump <outDir> <tag> <query>...`
  * (query name `ALL` dumps every declared query). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query>...")
    val outDir = args(0)
    val tag = args(1)
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
    new java.io.File(outDir).mkdirs()
    val names =
      if (args.drop(2).sameElements(Array("ALL"))) SparkEntry.queries.keys.toSeq
      else args.drop(2).toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"no query named '$name'"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PLAN $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
