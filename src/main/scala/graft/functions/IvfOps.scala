package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Centroid-assignment expressions for IVF similarity search.
  *
  * The centroid matrix is a (small) model parameter baked into the
  * expression tree — it ships to executors with the serialized plan, the
  * Spark-native way to broadcast model state without a shuffle or a UDF
  * closure. Assignment is one dot-product loop per row.
  */
private[functions] object CentroidMath {
  /** index of the centroid with max cosine (centroids pre-normalized;
    * ties → lowest index). */
  def best(vec: Array[Double], centroids: Array[Array[Double]]): Int = {
    var bi = 0; var bs = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      var s = 0.0; var i = 0
      val n = math.min(vec.length, cv.length)
      while (i < n) { s += vec(i) * cv(i); i += 1 }
      // cosine ∝ dot / ‖vec‖ — ‖vec‖ constant per row, safe to skip
      if (s > bs) { bs = s; bi = c }
      c += 1
    }
    bi
  }

  def read(a: ArrayData, et: DataType): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    et match {
      case DoubleType => while (i < n) { out(i) = a.getDouble(i); i += 1 }
      case FloatType => while (i < n) { out(i) = a.getFloat(i).toDouble; i += 1 }
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }
    out
  }

  def elemType(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }
}

/** `list_id` of the nearest coarse centroid (spherical / max-cosine). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val vec = CentroidMath.read(v.asInstanceOf[ArrayData],
      CentroidMath.elemType(child.dataType))
    java.lang.Integer.valueOf(CentroidMath.best(vec, centroids))
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

/** The `nprobe` nearest centroid ids for a probe vector, by cosine. */
case class ProbeLists(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val vec = CentroidMath.read(v.asInstanceOf[ArrayData],
      CentroidMath.elemType(child.dataType))
    val scored = centroids.indices.map { c =>
      val cv = centroids(c)
      var s = 0.0; var i = 0
      val n = math.min(vec.length, cv.length)
      while (i < n) { s += vec(i) * cv(i); i += 1 }
      (c, s)
    }
    val top = scored.sortBy { case (c, s) => (-s, c) }.take(nprobe).map(_._1)
    new GenericArrayData(top.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ProbeLists =
    copy(child = c)
  override def prettyName: String = "probe_lists"
}

object IvfFunctions {
  def nearest_centroid(v: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(v), centroids))
  def probe_lists(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    Bridge.column(ProbeLists(Bridge.expression(v), centroids, nprobe))
}
