package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k largest (score, id) pairs per
  * group, ordered by (score DESC, id ASC). A TypedImperativeAggregate,
  * so Spark runs it with partial aggregation — each map task reduces
  * its partition to ≤ k candidates per group before the shuffle, which
  * is what makes brute-force ANN scan-shaped at 100 TB (the exchange
  * carries k rows per (group × partition), not the corpus).
  *
  * Scores are expected fixed-point (LongType) so ranking is
  * deterministic across engines (ties broken by id).
  *
  * SET semantics, deliberately: an identical (score, id) pair added
  * twice counts once. That is the contract a ranked NEIGHBOR list
  * needs — multi-table LSH / multi-probe IVF legitimately emit the
  * same candidate several times, and a top-k that listed one neighbor
  * twice would be wrong. Callers needing multiset top-k over
  * non-unique ids must disambiguate the id first.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  require(k > 0, "k must be positive")

  // fail at analysis time with the column named, not with an executor
  // ClassCastException mid-job on s.asInstanceOf[Long]
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = Seq("score" -> score, "id" -> id).collectFirst {
      case (name, e) if e.dataType != LongType => (name, e.dataType)
    }
    bad match {
      case Some((name, t)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topK $name must be LongType (fixed-point encode doubles first), got $t")
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  private val ord = new Ordering[(Long, Long)] {
    // "best" = highest score, then lowest id; TreeSet keeps ascending,
    // so head is the weakest entry (evicted first).
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  override def update(buf: java.util.TreeSet[(Long, Long)], input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      add(buf, (s.asInstanceOf[Long], i.asInstanceOf[Long]))
    }
    buf
  }

  private def add(buf: java.util.TreeSet[(Long, Long)], e: (Long, Long)): Unit = {
    buf.add(e)
    if (buf.size > k) buf.pollFirst()
  }

  override def merge(a: java.util.TreeSet[(Long, Long)], b: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    // descending (best first)
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator()
    var i = 0
    while (it.hasNext) {
      val (s, d) = it.next()
      out(i) = new GenericInternalRow(Array[Any](s, d))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeLong(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_topk"
}

object TopKAgg {
  /** Column wrapper: topK(fp-encoded score, id, k) → array<struct<score,id>> best-first. */
  def topK(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
  }
}
