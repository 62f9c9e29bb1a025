package graft

/** Option resolution reproducing the reference's 3-layer config semantics
  * (reference: config/OptionReader.java:90-169; README.md:509-524):
  *
  *  - layering: base options (CQL `WITH OPTIONS`) < properties file
  *    (`es-index.properties`) < environment/system properties;
  *  - locality: `<dc.rack>.key` > `<dc>.key` > `key`
  *    (OptionReader.java:128-155);
  *  - env/sysprop keys carry an `es-` prefix and hyphen and dot forms are
  *    equivalent (OptionReader.java:157-169).
  *
  * Pure functions over maps — the reference's scheduled hot-reload (M11)
  * becomes "call resolve again with fresh layers".
  */
object OptionReader {

  val EnvPrefix = "es-"

  private def normalize(key: String): String = key.replace('.', '-').toLowerCase

  /** Collapse locality-prefixed keys: for every `<dc.rack>.key` / `<dc>.key`
    * matching this node's dc/rack, the most specific wins. Prefixes use the
    * reference's `<...>` bracket syntax. */
  def applyLocality(options: Map[String, String], dc: String, rack: String): Map[String, String] = {
    val dcPrefix = s"<$dc>."
    val rackPrefix = s"<$dc.$rack>."
    val bare = options.filterNot { case (k, _) => k.startsWith("<") }
    val dcLevel = options.collect {
      case (k, v) if k.startsWith(dcPrefix) => k.substring(dcPrefix.length) -> v
    }
    val rackLevel = options.collect {
      case (k, v) if k.startsWith(rackPrefix) => k.substring(rackPrefix.length) -> v
    }
    bare ++ dcLevel ++ rackLevel
  }

  /** Full resolution: layer base < fileProps < env (env keys prefixed
    * `es-`, hyphen/dot equivalent), then locality collapse. Keys are
    * normalized to hyphen-lowercase form. */
  def resolve(base: Map[String, String],
              fileProps: Map[String, String] = Map.empty,
              env: Map[String, String] = Map.empty,
              dc: String = "", rack: String = ""): Map[String, String] = {
    // locality-prefixed keys normalize their suffix (`<dc1>.a.b` → `<dc1>.a-b`)
    // so dot-form per-DC overrides still match hyphen-form lookups
    def norm(m: Map[String, String]): Map[String, String] =
      m.map { case (k, v) =>
        val key =
          if (k.startsWith("<")) {
            val close = k.indexOf(">.")
            if (close > 0) k.substring(0, close + 2) + normalize(k.substring(close + 2))
            else k
          } else normalize(k)
        key -> v
      }
    val envLayer = env.collect {
      case (k, v) if normalize(k).startsWith(EnvPrefix) =>
        normalize(k).substring(EnvPrefix.length) -> v
    }
    applyLocality(norm(base) ++ norm(fileProps) ++ envLayer, dc, rack)
  }

  /** Build a typed [[IndexConfig]] from resolved options, with the
    * reference's defaults (IndexConfig.java:61-144) for anything unset.
    * `typeName` scopes the ingest-pipeline lookup: `pipeline-<typeName>`
    * (the reference's per-type key, IndexConfiguration.java:91-93), falling
    * back to a bare `pipeline` option for single-type stores. */
  def toConfig(opts: Map[String, String], typeName: String = ""): IndexConfig = {
    // malformed values fall back to the default instead of throwing, like
    // the reference's OptionReader.getInteger/getBoolean
    // (OptionReader.java:117-126)
    def bool(k: String, dflt: Boolean) =
      opts.get(k).map(java.lang.Boolean.parseBoolean).getOrElse(dflt)
    def num[T](k: String, dflt: T)(parse: String => T): T =
      opts.get(k).flatMap(v => scala.util.Try(parse(v)).toOption).getOrElse(dflt)
    def csv(k: String) = opts.get(k).toSet.flatMap((s: String) =>
      s.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    IndexConfig(
      maxResults = num("max-results", 10000)(_.toInt),
      defaultOperator = opts.getOrElse("default-operator", "AND") match {
        case op if op.equalsIgnoreCase("OR") => "OR"
        case op if op.equalsIgnoreCase("AND") => "AND"
        // loud, matching QueryCompiler.resolveOperator: a typo here would
        // silently flip every query's semantics, unlike the numeric knobs
        case other => throw new IllegalArgumentException(
          s"default-operator must be AND or OR, got: $other")
      },
      discardNulls = bool("discard-nulls", dflt = true),
      insertOnly = bool("insert-only", dflt = false),
      analyticMode = bool("analytic-mode", dflt = false),
      ttlShiftSec = num("ttl-shift", 0L)(_.toLong),
      segment = opts.getOrElse("segment", "OFF").toUpperCase match {
        case "HOUR" => SegmentGranularity.Hour
        case "DAY" => SegmentGranularity.Day
        case "MONTH" => SegmentGranularity.Month
        case "YEAR" => SegmentGranularity.Year
        // reference CUSTOM mode: fixed frames of segment-size ms
        // (IndexDropManager.java:92-99; default IndexConfig.java:557)
        case "CUSTOM" => SegmentGranularity.Fixed(
          num("segment-size", 86400000L)(_.toLong))
        case _ => SegmentGranularity.Off
      },
      jsonSerializedFields = csv("json-serialized-fields"),
      jsonFlatSerializedFields = csv("json-flat-serialized-fields"),
      indexationDate = bool("per-index-date", dflt = true),
      skipBadJson = bool("skip-bad-json", dflt = false),
      dummy = bool("dummy", dflt = false),
      pipeline = (if (typeName.nonEmpty) opts.get(s"pipeline-$typeName") else None)
        .orElse(opts.get("pipeline")).filter(_.trim.nonEmpty))
  }
}
