package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Product-quantization kernels for ANN search (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the FAISS scale
  * path).
  *
  * A vector is split into `m` subvectors; each subvector is replaced by the
  * index of its nearest codebook centroid, so the stored representation is
  * `m` small ints instead of `dims` floats — at 64 dims / 8 subspaces the
  * vector payload shrinks ~32× (what lets 100 TB of float vectors fit a
  * codes table that scans in minutes). Query-time scoring is Asymmetric
  * Distance Computation: ONE `m·ksub`-entry lookup table of
  * subvector-dot-products per QUERY, then `m` table lookups per corpus row
  * — O(m) adds instead of O(dims) multiplies, and the float vectors are
  * never read at all.
  *
  * Like the IVF kernels ([[NearestCentroid]]), codebooks are model
  * parameters baked into the expression tree — they ship with the
  * serialized plan, no shuffle, no UDF closure.
  */
private[functions] object PqMath {
  /** codebooks(s)(c) = centroid c of subspace s; dsub = dims / m. */
  def dsubOf(codebooks: Array[Array[Array[Double]]]): Int = codebooks(0)(0).length

  /** The ADC LUT is laid out as a dense `m × ksub` table with ksub taken
    * from subspace 0, so a ragged caller-supplied codebook (Pq.train pads,
    * but encode/adcTopK are public) would silently write into the next
    * subspace's stride — corrupt scores, no error. Fail loud instead. */
  def requireUniform(codebooks: Array[Array[Array[Double]]]): Unit = {
    require(codebooks.nonEmpty && codebooks(0).nonEmpty,
      "codebooks must be non-empty")
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    require(codebooks.forall(_.length == ksub),
      s"ragged codebooks: every subspace needs $ksub centroids " +
        s"(got ${codebooks.map(_.length).mkString(",")})")
    require(codebooks.forall(_.forall(_.length == dsub)),
      s"ragged codebooks: every centroid needs $dsub dims")
  }

  /** L2-normalize in place (spherical PQ: every vector is normalized before
    * training/encoding/LUT so ADC approximates cosine). Zero vectors stay
    * zero (score 0 — same contract as `vec_cosine`'s NaN guard). Doing this
    * inside the kernel keeps the plan free of the interpreted
    * `transform(v, x -> x / norm)` lambda, which re-evaluates its child per
    * element. */
  def normalize(vec: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < vec.length) { s += vec(i) * vec(i); i += 1 }
    val n = math.sqrt(s)
    if (n > 0) { i = 0; while (i < vec.length) { vec(i) /= n; i += 1 } }
    vec
  }

  /** Nearest centroid of subspace `s` for `vec[s*dsub ..< (s+1)*dsub]` by
    * squared L2 (the PQ training/encoding metric — minimizes reconstruction
    * error, which is what makes ADC inner products accurate). Ties → lowest
    * index, so encoding is deterministic. */
  def bestCode(vec: Array[Double], cb: Array[Array[Double]], off: Int): Int = {
    var bi = 0; var bd = Double.PositiveInfinity
    var c = 0
    while (c < cb.length) {
      val cv = cb(c)
      var d = 0.0; var i = 0
      while (i < cv.length) {
        val diff = vec(off + i) - cv(i); d += diff * diff; i += 1
      }
      if (d < bd) { bd = d; bi = c }
      c += 1
    }
    bi
  }
}

/** PQ codes of a vector: `array<int>` of length `m` (subspace-nearest
  * centroid indices). Input vectors should be pre-normalized when the
  * downstream score is meant to approximate cosine. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  PqMath.requireUniform(codebooks)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val vec = PqMath.normalize(CentroidMath.read(v.asInstanceOf[ArrayData],
      CentroidMath.elemType(child.dataType)))
    val dsub = PqMath.dsubOf(codebooks)
    val m = codebooks.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      out(s) = PqMath.bestCode(vec, codebooks(s), s * dsub)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** ADC lookup table for a query vector: `array<double>` of length
  * `m·ksub` where entry `s·ksub + c` = ⟨query subvector s, codebook[s][c]⟩.
  * Computed once per QUERY row (queries are few and broadcast); corpus rows
  * only ever index into it. */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  PqMath.requireUniform(codebooks)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val vec = PqMath.normalize(CentroidMath.read(v.asInstanceOf[ArrayData],
      CentroidMath.elemType(child.dataType)))
    val dsub = PqMath.dsubOf(codebooks)
    val m = codebooks.length
    val ksub = codebooks(0).length
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      var c = 0
      while (c < cb.length) {
        val cv = cb(c)
        var d = 0.0; var i = 0
        while (i < cv.length) { d += vec(s * dsub + i) * cv(i); i += 1 }
        out(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqLut = copy(child = c)
  override def prettyName: String = "pq_lut"
}

/** ADC score: `Σ_s lut[s·ksub + codes[s]]` — the approximate inner product
  * of the query with the quantized corpus vector. `m` array reads and adds
  * per corpus row; the float vector is never touched. */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    var s = 0
    var sum = 0.0
    val m = codes.numElements()
    while (s < m) {
      sum += lut.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    java.lang.Double.valueOf(sum)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}

object PqFunctions {
  def pq_encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(v), codebooks))
  def pq_lut(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqLut(Bridge.expression(v), codebooks))
  def pq_adc(codes: Column, lut: Column, ksub: Int): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(lut), ksub))
}
