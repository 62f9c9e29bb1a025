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
    val syms = BpeCore.encodeWord(v.asInstanceOf[UTF8String].toString,
      lefts, rights, merged)
    val arr = new Array[AnyRef](syms.length)
    var i = 0
    while (i < syms.length) { arr(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
  override def prettyName: String = "bpe_encode"
}

/** The shared word → symbols merge loop (see [[BpeEncode]]'s scaladoc for
  * the exact greedy semantics both expressions preserve). */
private[functions] object BpeCore {
  def encodeWord(word: String, lefts: Array[String], rights: Array[String],
                 merged: Array[String]): Array[String] = {
    val syms = new Array[String](word.length)
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
    java.util.Arrays.copyOf(syms, n)
  }
}

/** One-pass document encode: words-array → dense token ids, holding the
  * whole tokenizer (merge rules + frozen vocabulary) in the expression —
  * the narrow-projection form of BPE encoding (r15).
  *
  * The r14 shape exploded the corpus to (doc, word-pos, token-pos) rows,
  * joined two broadcast tables and re-assembled per doc with a
  * sort_array(collect_list(...)) hash aggregate — a full corpus shuffle
  * whose payload was every token instance, paid to recover an ordering
  * ([[BpeEncodeIds]] emits ids in word order natively). Here each row
  * costs only the per-word merge loop, amortized by a per-task word →
  * ids cache (Zipf: instances ≫ distinct words, so most lookups hit),
  * and NOTHING shuffles.
  *
  * Unknown tokens (a frozen-vocabulary serve over novel text) map to -1,
  * the explicit UNK sentinel — identical to the left-join + coalesce(-1)
  * the r14 store-served form used. Output per doc is the concatenation
  * of each word's encoded ids in word order, [] for token-less docs once
  * the caller coalesces the null-text case (exactly the old left-join
  * miss behavior). */
case class BpeEncodeIds(child: Expression, rules: Seq[(String, String)],
                        vocab: Map[String, Int])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val merged: Array[String] =
    rules.map { case (l, r) => l + r }.toArray
  @transient private lazy val lefts: Array[String] = rules.map(_._1).toArray
  @transient private lazy val rights: Array[String] = rules.map(_._2).toArray
  // per-task-instance cache: word → encoded ids. Keyed by String (an
  // input UTF8String may alias a reused row buffer — never safe to hold).
  // Bounded so an adversarial unbounded vocabulary degrades to
  // recompute-per-instance, never to executor memory growth.
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[Int]]()
  private val cacheCap = 1 << 20

  private def idsOf(word: String): Array[Int] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    val toks = BpeCore.encodeWord(word, lefts, rights, merged)
    val out = new Array[Int](toks.length)
    var i = 0
    while (i < out.length) {
      out(i) = vocab.getOrElse(toks(i), -1)
      i += 1
    }
    if (cache.size < cacheCap) cache.put(word, out)
    out
  }

  override protected def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = words.numElements()
    val parts = new Array[Array[Int]](n)
    var total = 0
    var i = 0
    while (i < n) {
      parts(i) = idsOf(words.getUTF8String(i).toString)
      total += parts(i).length
      i += 1
    }
    val flat = new Array[Any](total)
    var o = 0
    i = 0
    while (i < n) {
      val p = parts(i)
      var j = 0
      while (j < p.length) { flat(o) = p(j); o += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(flat)
  }

  override protected def withNewChildInternal(c: Expression): BpeEncodeIds =
    copy(child = c)
  override def prettyName: String = "bpe_encode_ids"
}

object BpeOps {
  /** Column wrapper: tokenize one word column with a learned rule table
    * (rank order). */
  def bpeEncode(word: Column, rules: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(word), rules))

  /** Column wrapper: encode a words-array column straight to dense token
    * ids with a learned rule table + frozen vocabulary (see
    * [[BpeEncodeIds]]). */
  def bpeEncodeIds(words: Column, rules: Seq[(String, String)],
                   vocab: Map[String, Int]): Column =
    Bridge.column(BpeEncodeIds(Bridge.expression(words), rules, vocab))
}
