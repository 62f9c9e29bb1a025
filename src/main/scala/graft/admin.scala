package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9 admin command protocol: the reference dispatches `#...#`-wrapped
  * commands through the same search entry point
  * (reference: EsSecondaryIndex.java:441-471 — `#update#{json}#` at 446-448,
  * `#get_mapping#` at 466-468, `#put_mapping#...#` at 470-471; truncate via
  * index lifecycle EsSecondaryIndex.java:335-337).
  */
sealed trait AdminCommand
object AdminCommand {
  case object GetMapping extends AdminCommand
  final case class PutMapping(mappingJson: String) extends AdminCommand
  final case class UpdateSettings(optionsJson: String) extends AdminCommand
  case object Truncate extends AdminCommand

  /** Recognize an admin command; None → a regular search query. */
  def parse(query: String): Option[AdminCommand] = {
    if (query == null || !query.startsWith("#")) None
    else if (query == "#get_mapping#") Some(GetMapping)
    else if (query == "#truncate#") Some(Truncate)
    else if (query.startsWith("#put_mapping#") && query.endsWith("#") &&
             query.length > "#put_mapping#".length)
      Some(PutMapping(query.substring("#put_mapping#".length, query.length - 1)))
    else if (query.startsWith("#update#") && query.endsWith("#") &&
             query.length > "#update#".length)
      Some(UpdateSettings(query.substring("#update#".length, query.length - 1)))
    else None // `#options:` and unknown # strings fall through to search
  }
}

/** Admin executor: each command becomes a small DataFrame result, the
  * analog of the reference's fake result rows (EsSecondaryIndex.java:517-533).
  */
object Admin {
  import com.fasterxml.jackson.databind.ObjectMapper
  private val mapper = new ObjectMapper()

  /** Dispatch an admin command against a doc table. Returns the result
    * frame and (for UpdateSettings) the re-resolved config — settings
    * hot-reload is re-resolution (M11; reference: EsSecondaryIndex.java:535-598,
    * OptionReader.java:90-107). */
  def execute(spark: SparkSession, docs: DataFrame, cmd: AdminCommand,
              cfg: IndexConfig): (DataFrame, IndexConfig) = {
    import spark.implicits._
    cmd match {
      case AdminCommand.GetMapping =>
        (Maintain.getMapping(docs).toDF("field", "dtype", "es_type"), cfg)
      case AdminCommand.PutMapping(json) =>
        // a static mapping in this engine is a schema assertion: report
        // which requested fields exist (applying ES mappings is a no-op —
        // Parquet schema is authoritative)
        val requested = try {
          val node = mapper.readTree(json)
          if (node != null && node.isObject)
            node.fieldNames.asScalaIterator.toSeq
          else Seq.empty
        } catch { case _: Exception => Seq.empty }
        val have = docs.columns.toSet
        (requested.map(f => (f, have.contains(f))).toDF("field", "present"), cfg)
      case AdminCommand.UpdateSettings(json) =>
        val opts = try {
          val node = mapper.readTree(json)
          if (node == null || !node.isObject) Map.empty[String, String]
          else node.fields.asScalaIterator
            .map(e => e.getKey -> e.getValue.asText).toMap
        } catch { case _: Exception => Map.empty[String, String] }
        val next = OptionReader.toConfig(OptionReader.resolve(opts))
        (Seq(("settings", "reloaded", opts.size)).toDF("op", "status", "n_options"), next)
      case AdminCommand.Truncate =>
        // dummy mode (M13) no-ops every sink, truncate included
        // (reference: EsDummyIndex.java truncate no-op)
        (if (cfg.dummy) docs else Maintain.truncate(docs), cfg)
    }
  }

  /** ES `_search_shards` analog: the deterministic token ring behind the
    * shard filter ([[Indexer.shardFilter]] hashes pks into `nShards`
    * slots; the reference walks real Cassandra token ranges for the same
    * purpose — EsSecondaryIndex.java:490-504). One row per shard with its
    * signed-64 token range: disjoint, complete, reproducible — the
    * routing table a coordinator needs to fan a query out with no overlap
    * and no gap. Pure metadata (N driver-built rows), no data scan. */
  def searchShards(spark: SparkSession, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import spark.implicits._
    val span = BigInt(2).pow(64) / nShards
    val min = BigInt(Long.MinValue)
    (0 until nShards).map { i =>
      val start = min + span * i
      val end = if (i == nShards - 1) BigInt(Long.MaxValue)
                else min + span * (i + 1) - 1
      (i, start.toLong, end.toLong)
    }.toDF("shard", "token_start", "token_end")
  }

  private implicit class IterShim[A](it: java.util.Iterator[A]) {
    def asScalaIterator: Iterator[A] = {
      import scala.jdk.CollectionConverters._
      it.asScala
    }
  }
}
