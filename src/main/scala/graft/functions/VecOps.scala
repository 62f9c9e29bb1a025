package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native vector expressions for embedding columns.
  *
  * `zip_with`/`aggregate` higher-order functions evaluate one interpreted
  * lambda call per element — for a 64-dim dot product over millions of rows
  * that overhead dominates. These expressions run one tight primitive loop
  * per row instead, reading `ArrayData` directly for both `float` and
  * `double` element types (no cast, no per-element allocation).
  */
private object VecOps {
  def elemType(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }

  @inline def get(a: ArrayData, et: DataType, i: Int): Double = et match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  /** Integer tag for codegen (a DataType can't appear in generated Java).
    * NullType (`array()` literals) tags to 4: legal for EMPTY arrays — the
    * kernels never read an element — and fails loudly on element access. */
  def tag(et: DataType): Int = et match {
    case DoubleType => 0
    case FloatType => 1
    case LongType => 2
    case IntegerType => 3
    case NullType => 4
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }
}

/** Static kernels the generated Java calls directly — keeps the vector math
  * inside WholeStageCodegen (CodegenFallback would re-materialize and box
  * an InternalRow per call). Scala object methods surface as static
  * forwarders, so Janino resolves `graft.functions.VecKernels.dot(...)`. */
object VecKernels {
  @inline private def get(a: ArrayData, tag: Int, i: Int): Double = tag match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getLong(i).toDouble
    case 3 => a.getInt(i).toDouble
    case _ => throw new IllegalArgumentException(
      "vector kernel: unsupported element type (null-typed non-empty array?)")
  }

  def dot(a: ArrayData, ta: Int, b: ArrayData, tb: Int): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch ($n vs ${b.numElements()})")
    var s = 0.0d; var i = 0
    while (i < n) { s += get(a, ta, i) * get(b, tb, i); i += 1 }
    s
  }

  /** Fused cosine; null when either norm is zero. */
  def cosine(a: ArrayData, ta: Int, b: ArrayData, tb: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_cosine: dimension mismatch ($n vs ${b.numElements()})")
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d; var i = 0
    while (i < n) {
      val x = get(a, ta, i); val y = get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0d) null else java.lang.Double.valueOf(dot / denom)
  }

  def norm(a: ArrayData, ta: Int): Double = {
    var s = 0.0d; var i = 0
    val n = a.numElements()
    while (i < n) { val x = get(a, ta, i); s += x * x; i += 1 }
    math.sqrt(s)
  }
}

/** Σ aᵢ·bᵢ in one pass. Mismatched dimensions are corrupt data — fail
  * loudly rather than score a truncated garbage vector as a plausible match. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.dot(l.asInstanceOf[ArrayData], VecOps.tag(VecOps.elemType(left.dataType)),
      r.asInstanceOf[ArrayData], VecOps.tag(VecOps.elemType(right.dataType)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ta, tb) = (VecOps.tag(VecOps.elemType(left.dataType)),
      VecOps.tag(VecOps.elemType(right.dataType)))
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.dot($a, $ta, $b, $tb);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Fused cosine: dot product and both norms in ONE loop per row (separate
  * vec_dot/vec_norm expressions would traverse each vector twice more under
  * CodegenFallback — no CSE). NULL when either norm is zero (NaN would sort
  * above every double and win every desc top-k); dimension mismatch throws. */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.cosine(l.asInstanceOf[ArrayData], VecOps.tag(VecOps.elemType(left.dataType)),
      r.asInstanceOf[ArrayData], VecOps.tag(VecOps.elemType(right.dataType)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ta, tb) = (VecOps.tag(VecOps.elemType(left.dataType)),
      VecOps.tag(VecOps.elemType(right.dataType)))
    // boxed result: a zero-norm vector yields SQL NULL, not NaN
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cos")
      s"""
         |java.lang.Double $boxed = graft.functions.VecKernels.cosine($a, $ta, $b, $tb);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}

/** ‖v‖₂ in one pass. */
case class VecNorm(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    VecKernels.norm(v.asInstanceOf[ArrayData], VecOps.tag(VecOps.elemType(child.dataType)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = VecOps.tag(VecOps.elemType(child.dataType))
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecKernels.norm($a, $t);")
  }

  override protected def withNewChildInternal(c: Expression): VecNorm = copy(child = c)
  override def prettyName: String = "vec_norm"
}

/** `v / ‖v‖₂` as `array<double>` in one pass; zero vectors pass through
  * as zero (downstream dot products score 0 — same contract as
  * `vec_cosine`'s NaN guard). The native form keeps normalization out of
  * the interpreted `transform(v, x -> x / norm)` lambda, which would
  * re-evaluate the norm child per element. */
case class VecNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val et = VecOps.elemType(child.dataType)
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = VecOps.get(a, et, i)
      i += 1
    }
    var s = 0.0; i = 0
    while (i < n) { s += out(i) * out(i); i += 1 }
    val norm = math.sqrt(s)
    if (norm > 0) { i = 0; while (i < n) { out(i) /= norm; i += 1 } }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): VecNormalize = copy(child = c)
  override def prettyName: String = "vec_normalize"
}

/** Symmetric per-vector int8-range scalar quantization in one pass:
  * `q_i = round(x_i · 127 / max(|x|, 1e-30))` ∈ [−127, 127] as
  * `array<int>` (ties round away from zero — Spark `round`/DuckDB `round`
  * semantics). The declarative twin
  * (`transform(v, x -> round(x·127/maxabs))` with `maxabs` aliased in a
  * prior projection) is semantically identical but `CollapseProject`
  * inlines the alias INTO the lambda, and interpreted higher-order lambdas
  * re-evaluate children per element — the `array_max` re-runs for every
  * element, O(dims²) per row (measured: 6.3 s of the quantized-ANN bench
  * query, vs ~0.3 s with this kernel). */
case class VecQuantize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val et = VecOps.elemType(child.dataType)
    val n = a.numElements()
    val x = new Array[Double](n)
    var maxabs = 1e-30
    var i = 0
    while (i < n) {
      x(i) = VecOps.get(a, et, i)
      val ab = math.abs(x(i))
      if (ab > maxabs) maxabs = ab
      i += 1
    }
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      val s = x(i) * 127.0 / maxabs
      out(i) = (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): VecQuantize = copy(child = c)
  override def prettyName: String = "vec_quantize"
}

/** Random-hyperplane LSH band buckets: `bands` values, each packing
  * `bitsPerBand` sign bits of deterministic ±1 hyperplane projections.
  * The hyperplane sign matrix is derived from a splitmix64-style hash of
  * (dimension, bit) — reproducible across runs with no RNG state — and
  * cached per (dims, bits) so it is computed once per executor, not per row.
  *
  * The ±1 (Rademacher) family is NOT the Gaussian family the standard
  * SimHash collision formula `1 − θ/π` assumes: in high dimension a ±1
  * projection is Gaussian to CLT accuracy and the formula holds, but in
  * low dimension the family has few distinct directions (2-d: exactly
  * two), so collision probabilities for structured/axis-aligned inputs
  * can sit far from the formula. Consumers that GATE on that formula
  * ([[graft.pipeline.Dedup.lshEscapeRecall]]) should spot-check
  * empirically near the gate ([[graft.pipeline.Dedup.empiricalLshRecall]],
  * `graft.semdedup.recallSample`). */
case class RhpBuckets(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression with CodegenFallback {
  require(bands >= 1, s"bands must be >= 1, got $bands")
  require(bitsPerBand >= 1 && bitsPerBand <= 63,
    s"bitsPerBand must be in [1, 63], got $bitsPerBand") // JVM shifts wrap mod 64

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val totalBits = bands * bitsPerBand

  // volatile: safely published if the expression instance is shared across
  // threads; a race only duplicates the (deterministic) computation
  @transient @volatile private var signs: Array[Array[Double]] = _ // [bit][dim]

  private def signMatrix(dims: Int): Array[Array[Double]] = {
    val cached = signs
    if (cached != null && cached(0).length == dims) cached
    else {
      val fresh = Array.tabulate(totalBits, dims) { (b, i) =>
        // splitmix64 finalizer over the (bit, dim) pair
        var z = b.toLong * 0x9E3779B97F4A7C15L + i.toLong + 0x632BE59BD9B4E019L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if ((z & 1L) == 0L) 1.0 else -1.0
      }
      signs = fresh
      fresh
    }
  }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val t = VecOps.elemType(child.dataType)
    val n = a.numElements()
    val m = signMatrix(n)
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) { vec(i) = VecOps.get(a, t, i); i += 1 }
    val out = new Array[Long](bands)
    var bit = 0
    while (bit < totalBits) {
      val row = m(bit)
      var proj = 0.0d; var j = 0
      while (j < n) { proj += vec(j) * row(j); j += 1 }
      if (proj >= 0)
        out(bit / bitsPerBand) |= (1L << (bit % bitsPerBand))
      bit += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): RhpBuckets = copy(child = c)
  override def prettyName: String = "rhp_buckets"
}

object VecFunctions {
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
  def vec_norm(v: Column): Column =
    Bridge.column(VecNorm(Bridge.expression(v)))
  def vec_cosine(a: Column, b: Column): Column =
    Bridge.column(VecCosine(Bridge.expression(a), Bridge.expression(b)))
  def vec_normalize(v: Column): Column =
    Bridge.column(VecNormalize(Bridge.expression(v)))
  def vec_quantize(v: Column): Column =
    Bridge.column(VecQuantize(Bridge.expression(v)))
  def rhp_buckets(v: Column, bands: Int, bitsPerBand: Int): Column =
    Bridge.column(RhpBuckets(Bridge.expression(v), bands, bitsPerBand))
}
