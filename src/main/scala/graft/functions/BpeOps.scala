package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encode: apply a learned merge-rule table to one word in a
  * tight loop, replacing the per-rule `aggregate(...)` fold the first
  * implementation used (a nested expression tree whose depth grew with
  * the rule count — codegen-hostile and interpreted per element at 32k
  * rules). The whole rule table rides in the expression; each row costs
  * O(rules-that-match × |word|), with a substring pre-check that skips
  * the rules whose merged token can't occur (the symbol concatenation is
  * always the original word, so `word.contains(merged)` is exact).
  *
  * Semantics match the fold exactly: rules in rank order, each applied
  * greedily left-to-right non-overlapping, and a token merged by rule k
  * can immediately participate as the LEFT symbol of a later rule-k match
  * in the same pass (the fold's accumulator behavior). */
case class BpeEncode(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val merged: Array[String] =
    rules.map { case (l, r) => l + r }.toArray
  @transient private lazy val lefts: Array[String] = rules.map(_._1).toArray
  @transient private lazy val rights: Array[String] = rules.map(_._2).toArray

  override protected def nullSafeEval(v: Any): Any = {
    val word = v.asInstanceOf[UTF8String].toString
    var syms = new Array[String](word.length)
    var n = 0
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val w = Character.charCount(cp)
      syms(n) = word.substring(ci, ci + w)
      n += 1
      ci += w
    }
    var k = 0
    while (k < lefts.length && n > 1) {
      if (word.contains(merged(k))) {
        val l = lefts(k); val r = rights(k); val m = merged(k)
        var out = 0
        var i = 0
        while (i < n) {
          if (out > 0 && syms(out - 1) == l && syms(i) == r) syms(out - 1) = m
          else { syms(out) = syms(i); out += 1 }
          i += 1
        }
        n = out
      }
      k += 1
    }
    val arr = new Array[AnyRef](n)
    var i = 0
    while (i < n) { arr(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
  override def prettyName: String = "bpe_encode"
}

object BpeOps {
  /** Column wrapper: tokenize one word column with a learned rule table
    * (rank order). */
  def bpeEncode(word: Column, rules: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(word), rules))
}
