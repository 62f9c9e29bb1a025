package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (log base 2) of the CHARACTER distribution across all
  * input strings — the `string_stats` aggregation's `entropy` value
  * (reference surfaces ES's string_stats; ES computes it from the
  * concatenated field's code-point frequencies).
  *
  * Distributed form: each partition folds its strings into a code-point →
  * count histogram (bounded by alphabet size, not data size — a few hundred
  * entries even for mixed-script corpora), partials merge by summing, and
  * the final entropy is `-Σ (n_c/N) · log2(n_c/N)` over the merged map.
  * The histogram IS the sufficient statistic, so this is one
  * map-side-combinable pass at any scale.
  */
case class CharEntropy(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_entropy needs a string child, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "char_entropy"

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty[Int, Long]

  override def update(buf: mutable.HashMap[Int, Long],
                      input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        buf.update(cp, buf.getOrElse(cp, 0L) + 1L)
        i += Character.charCount(cp)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[Int, Long],
                     b: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
    b.foreach { case (cp, n) => a.update(cp, a.getOrElse(cp, 0L) + n) }
    a
  }

  override def eval(buf: mutable.HashMap[Int, Long]): Any = {
    if (buf.isEmpty) return null
    val total = buf.valuesIterator.sum.toDouble
    var h = 0.0
    buf.valuesIterator.foreach { n =>
      val p = n / total
      h -= p * (math.log(p) / math.log(2.0))
    }
    h
  }

  override def serialize(buf: mutable.HashMap[Int, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (cp, n) => out.writeInt(cp); out.writeLong(n) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val size = in.readInt()
    val m = mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < size) { m.update(in.readInt(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CharEntropy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CharEntropy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
