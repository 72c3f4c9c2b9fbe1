package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distributed second-moment accumulator over an embedding column:
  * one pass collects count, per-component sums, and the upper-triangle
  * gram matrix Σ eᵢeⱼ (i ≤ j) into a single flat buffer of
  * 1 + d + d(d+1)/2 doubles. A TypedImperativeAggregate, so Spark
  * partial-aggregates it: each map task reduces its partition to ONE
  * buffer before the exchange — the covariance of 10¹⁰ vectors
  * shuffles (#partitions × buffer) doubles, never the vectors. This is
  * the scan-shaped moment pass PCA/whitening pipelines need at 100 TB.
  *
  * Buffer layout: [0] count, [1..d] component sums,
  * [1+d ..] upper triangle row-major (offset(i,j) = i·d − i(i−1)/2 + (j−i)).
  * Float components are widened to double BEFORE multiplying, matching
  * a SQL `CAST(e[i] AS DOUBLE) * CAST(e[j] AS DOUBLE)` oracle
  * elementwise (summation order differs — fp-grid encode results).
  */
case class GramAgg(
    emb: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0, "dim must be positive")
  private val triLen = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + triLen

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    emb.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram expects array<float|double>, got $t")
    }

  // lazy: children are unresolved at construction (withNewChildrenInternal
  // copies through an UnresolvedAttribute before analysis binds types)
  private lazy val isFloat = emb.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = emb.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"gram: embedding length ${arr.numElements()} != dim $dim")
    val e = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      e(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf(0) += 1.0
    i = 0
    var off = 1 + dim
    while (i < dim) {
      buf(1 + i) += e(i)
      var j = i
      while (j < dim) {
        buf(off) += e(i) * e(j)
        off += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeDouble(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Double](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(emb)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(emb = newChildren(0))
  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_gram"
}

object GramAgg {
  /** Column wrapper: gram(embedding, d) → array<double> packed
    * [count, sums(d), upper-triangle gram(d(d+1)/2)].
    */
  def gram(emb: Column, dim: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      GramAgg(ColumnBridge.expression(emb), dim).toAggregateExpression())
  }
}
