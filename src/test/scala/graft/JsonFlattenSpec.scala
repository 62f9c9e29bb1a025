package graft
// includes the dotted→structured golden from the reference (JsonUtilsTest)

import graft.functions.JsonFlattenExpr
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** json_flatten golden + property tests.
  *
  * Golden pair is the reference's own fixture
  * (reference: JsonUtilsTest.java:87-95; spec README.md:562-592). */
class JsonFlattenSpec extends AnyFunSuite {

  test("reference golden: nested maps, arrays, scalars") {
    val in =
      """{"maps": {"key1":"value","key2":42,"keymap":{"sss1":null,"sss2":42,"sss0":"ffff"},"plap":"plop"},
         |"string":"string", "int":42, "plplpl":[1,2,3,4]}""".stripMargin
    val out = JsonFlattenExpr.flatten(in).toMap
    assert(out("maps").toSeq == Seq(
      "key1=value", "key2=42", "keymap={sss1=null, sss2=42, sss0=ffff}", "plap=plop"))
    assert(out("string").toSeq == Seq("string"))
    assert(out("int").toSeq == Seq("42"))
    assert(out("plplpl").toSeq == Seq("1", "2", "3", "4"))
  }

  test("malformed json and non-object roots yield null") {
    assert(JsonFlattenExpr.flatten("{oops") == null)
    assert(JsonFlattenExpr.flatten("[1,2]") == null)
    assert(JsonFlattenExpr.flatten("42") == null)
    assert(JsonFlattenExpr.flatten(null: String) == null)
  }

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => "\"" + s + "\""),
    Gen.choose(-1000000, 1000000).map(_.toString),
    Gen.oneOf("true", "false", "null"))

  private val jsonObjGen: Gen[String] = for {
    n <- Gen.choose(0, 6)
    keys <- Gen.listOfN(n, Gen.identifier.map(_.take(8)))
    vals <- Gen.listOfN(n, Gen.oneOf(
      scalarGen,
      scalarGen.map(v => s"[$v,$v]"),
      Gen.identifier.map(k => s"""{"${k.take(6)}":1}""")))
  } yield keys.distinct.zip(vals).map { case (k, v) => s""""$k":$v""" }
    .mkString("{", ",", "}")

  test("property: flatten is total on JSON objects — every value is a string array") {
    val samples = Iterator.continually(jsonObjGen.sample).flatten.take(200)
    samples.foreach { js =>
      val out = JsonFlattenExpr.flatten(js)
      assert(out != null, s"flatten returned null for: $js")
      out.foreach { case (_, vs) =>
        assert(vs != null && vs.forall(_ != null), s"null element for: $js")
      }
    }
  }

  test("dotted→structured matches the reference golden (JsonUtilsTest.java:87-95)") {
    val src = """{"index.translog.durability":"async","analysis.analyzer.email_analyzer.filter":"lowercase","analysis.analyzer.html_analyzer.tokenizer":"ngram","analysis.analyzer.email_analyzer.type":"pattern","index.analysis.normalizer.lower_ascii_normalizer.filter":["lowercase","asciifolding"],"index.analysis.analyzer.lowercase_analyzer.filter":"lowercase","index.analysis.analyzer.lowercase_analyzer.type":"custom","analysis.analyzer.html_analyzer.type":"custom","analysis.analyzer.html_analyzer.filter":"lowercase","analysis.analyzer.html_analyzer.char_filter":"html_strip","index.analysis.normalizer.lower_ascii_normalizer.type":"custom","index.analysis.analyzer.lowercase_analyzer.tokenizer":"keyword"}"""
    val exp = """{"index":{"translog":{"durability":"async"},"analysis":{"normalizer":{"lower_ascii_normalizer":{"filter":["lowercase","asciifolding"],"type":"custom"}},"analyzer":{"lowercase_analyzer":{"filter":"lowercase","type":"custom","tokenizer":"keyword"}}}},"analysis":{"analyzer":{"email_analyzer":{"filter":"lowercase","type":"pattern"},"html_analyzer":{"tokenizer":"ngram","type":"custom","filter":"lowercase","char_filter":"html_strip"}}}}"""
    assert(graft.functions.JsonShape.dottedToStructured(src) == exp)
  }

  test("dotted→structured rejects non-objects; plain keys pass through") {
    intercept[IllegalArgumentException] {
      graft.functions.JsonShape.dottedToStructured("""[1,2]""")
    }
    assert(graft.functions.JsonShape.dottedToStructured("""{"a":1,"b":"x"}""") ==
      """{"a":1,"b":"x"}""")
  }
}
