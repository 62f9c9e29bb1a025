package graft

import org.scalatest.funsuite.AnyFunSuite

/** Config precedence mirroring the reference fixtures
  * (reference: IndexConfigTest.java:45-75; OptionReader.java:90-169):
  * `<dc.rack>.k` > `<dc>.k` > `k`; env `es-k` overrides all layers;
  * hyphen and dot key forms equivalent; file layer beats base options. */
class OptionsSpec extends AnyFunSuite {

  test("locality precedence: rack > dc > bare") {
    val opts = Map(
      "unicast-hosts" -> "bare",
      "<dc1>.unicast-hosts" -> "dc",
      "<dc1.rack1>.unicast-hosts" -> "rack")
    assert(OptionReader.resolve(opts, dc = "dc1", rack = "rack1")("unicast-hosts") == "rack")
    assert(OptionReader.resolve(opts, dc = "dc1", rack = "other")("unicast-hosts") == "dc")
    assert(OptionReader.resolve(opts, dc = "dc2", rack = "r")("unicast-hosts") == "bare")
  }

  test("file layer beats base; env beats file") {
    val base = Map("max-results" -> "10")
    val file = Map("max-results" -> "20")
    val env = Map("es-max-results" -> "30")
    assert(OptionReader.resolve(base)("max-results") == "10")
    assert(OptionReader.resolve(base, file)("max-results") == "20")
    assert(OptionReader.resolve(base, file, env)("max-results") == "30")
  }

  test("hyphen and dot key forms are equivalent") {
    val r = OptionReader.resolve(Map("max.results" -> "7"))
    assert(r("max-results") == "7")
    assert(OptionReader.resolve(Map.empty, env = Map("es.max.results" -> "9"))("max-results") == "9")
    // dot form inside a locality prefix normalizes too
    val loc = OptionReader.resolve(Map("<dc1>.discard.nulls" -> "false"),
      dc = "dc1", rack = "r1")
    assert(loc("discard-nulls") == "false")
    assert(!OptionReader.toConfig(loc).discardNulls)
  }

  test("typed config from options with reference defaults") {
    val cfg = OptionReader.toConfig(OptionReader.resolve(Map(
      "max-results" -> "5000",
      "insert-only" -> "true",
      "segment" -> "day",
      "json-serialized-fields" -> "a, b")))
    assert(cfg.maxResults == 5000)
    assert(cfg.insertOnly)
    assert(cfg.segment == SegmentGranularity.Day)
    assert(cfg.jsonSerializedFields == Set("a", "b"))
    // untouched defaults (reference: IndexConfig.java:61-144)
    assert(cfg.discardNulls && !cfg.analyticMode && cfg.ttlShiftSec == 0L)
  }

  test("hot-reload is re-resolution (M11)") {
    val v1 = OptionReader.toConfig(OptionReader.resolve(Map("segment" -> "off")))
    val v2 = OptionReader.toConfig(OptionReader.resolve(Map("segment" -> "month")))
    assert(v1.segment == SegmentGranularity.Off)
    assert(v2.segment == SegmentGranularity.Month)
  }

  test("CUSTOM segment mode reads segment-size with the reference default") {
    val custom = OptionReader.toConfig(OptionReader.resolve(
      Map("segment" -> "custom", "segment-size" -> "3600000")))
    assert(custom.segment == SegmentGranularity.Fixed(3600000L))
    // default 86400000 ms (reference: IndexConfig segment-size default)
    val dflt = OptionReader.toConfig(OptionReader.resolve(Map("segment" -> "CUSTOM")))
    assert(dflt.segment == SegmentGranularity.Fixed(86400000L))
  }
}
