package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (dev fast path)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Full runs dump everything. A FILTERED dev run writes only its own
    // oracle entries + manifest — and only into a dir without a full dump
    // already present: overwriting a full oracle_sql.json with one entry
    // would downgrade the other stale result dirs to unvalidated
    // "rows-only" and let check.py pass having verified almost nothing.
    val filteredRun = only.isDefined
    val oraclePath = Paths.get(s"$outDir/oracle_sql.json")
    if (filteredRun && Files.exists(oraclePath))
      System.err.println(s"[verify] filtered run: keeping existing ${oraclePath} " +
        "(full compare stays authoritative); delete the dir for a clean filtered check")
    else {
      val json = SparkEntry.oracleSql
        .filter { case (k, _) => only.forall(_.contains(k)) }
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(oraclePath, json)
      // manifest of every query attempted (oracle AND rows-only): check.py
      // counts any attempted query with no result dir as a failure
      val manifest = SparkEntry.queries.keys.toSeq.sorted
        .filter(k => only.forall(_.contains(k)))
        .map(q).mkString("[", ",", "]")
      Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    }
    spark.stop()
  }
}
