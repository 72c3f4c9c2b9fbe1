package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch aggregate (Cormode & Muthukrishnan 2005): a d×w
  * counter matrix; each item increments one counter per row (hash_i
  * mod w), and a point estimate is the MIN over the d counters — never
  * an undercount, and over by more than εN (ε = e/w) with probability
  * at most (1/2)^d over the hash draw.
  *
  * This is the frequency-sketch scale path the exact heavy-hitter
  * query (text_top_words) cannot take at 100 TB when the key domain
  * explodes: the sketch is a FIXED d·w·8-byte buffer per group
  * regardless of cardinality, partial aggregation reduces every map
  * task to one buffer before the exchange, and merge is elementwise
  * addition — commutative and associative, so the final counters (and
  * therefore every estimate and every error-band verdict built on
  * them) are DETERMINISTIC under any partition/merge order, unlike
  * sample- or heap-based frequent-item summaries (Misra-Gries), whose
  * merge is order-sensitive.
  *
  * Hashes are seeded FNV-1a-then-splitmix64 finalizations over the
  * UTF-8 bytes — fixed constants, no RNG, identical across runs.
  * `eval` returns the flattened row-major counters as array<long>
  * (bounded: d·w values, the kmeansFit collect-a-model shape);
  * [[CmsAgg.estimate]] reads a point estimate from that collected
  * array.
  */
case class CmsAgg(
    item: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth $depth out of range [1,16]")
  require(width >= 2, s"width $width must be >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (item.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms item must be StringType, got ${item.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var i = 0
      while (i < depth) {
        buf(i * width + CmsAgg.bucket(bytes, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box(_): Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_cms"
}

object CmsAgg {
  /** Column wrapper: cms(stringCol, d, w) → array<long> (d·w row-major
    * counters).
    */
  def cms(item: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      CmsAgg(ColumnBridge.expression(item), depth, width)
        .toAggregateExpression())
  }

  /** Seeded 64-bit hash of UTF-8 bytes: FNV-1a folded with the seed,
    * finalized with the splitmix64 mixer so consecutive seeds give
    * independent-looking rows. Fixed constants — deterministic across
    * runs, JVMs, and partition layouts.
    */
  def hash(bytes: Array[Byte], seed: Int): Long = {
    var h = 0xcbf29ce484222325L ^ (seed.toLong * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finalizer
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Counter column for `seed` in a width-`w` row. */
  def bucket(bytes: Array[Byte], seed: Int, w: Int): Int = {
    val m = hash(bytes, seed) % w
    (if (m < 0) m + w else m).toInt
  }

  /** Point estimate from a collected sketch: min over the d rows. */
  def estimate(counters: Array[Long], depth: Int, width: Int,
               item: String): Long = {
    require(counters.length == depth * width, "sketch shape mismatch")
    val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counters(i * width + bucket(bytes, i, width))
      if (c < best) best = c
      i += 1
    }
    best
  }
}
