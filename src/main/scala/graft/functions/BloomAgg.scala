package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter aggregate (Bloom 1970): an m-bit array; each item sets
  * k bits (hash_i mod m), membership = all k bits set. No false
  * negatives by construction; false-positive rate ≈ (1 − e^{−kn/m})^k
  * over the hash draw.
  *
  * This is the decontamination scale path: at 100 TB the exact
  * benchmark-shingle join (text_contamination) ships the benchmark's
  * distinct-shingle set through an exchange, while the Bloom variant
  * reduces it to a FIXED m/8-byte bitset built in one pass (merge =
  * bitwise OR — commutative, associative, idempotent, so the final
  * bits are deterministic under ANY partition/merge order) that then
  * broadcasts to every executor; the probe side stays a map-side scan
  * with zero shuffle. A 1-in-100 false-positive rate is acceptable for
  * filtering (it only over-flags), and the one-sided guarantee — a
  * truly contaminated shingle is NEVER missed — is exactly the
  * direction decontamination needs.
  *
  * Hashes reuse [[CmsAgg.hash]] (seeded FNV-1a/splitmix64 over UTF-8
  * bytes — fixed constants, no RNG) with a seed offset so the Bloom
  * bit positions are independent-looking from the CMS buckets.
  * `eval` returns the bitset as array<long> (m/64 words — a bounded
  * control-plane collect, the kmeansFit shape).
  */
case class BloomAgg(
    item: Expression,
    numBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits $numBits must be a positive multiple of 64")
  require(k >= 1 && k <= 16, s"k $k out of range [1,16]")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (item.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom item must be StringType, got ${item.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = item.eval(input)
    if (v != null)
      BloomAgg.add(buf, k, v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
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
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_bloom"
}

object BloomAgg {
  /** Seed offset decorrelating Bloom bit positions from CMS buckets. */
  private final val SeedBase = 0x510a1

  /** Column wrapper: bloom(stringCol, m, k) → array<long> (m/64 words). */
  def bloom(item: Column, numBits: Int, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(item), numBits, k)
        .toAggregateExpression())
  }

  /** Bit position of hash i for an item in an m-bit filter. */
  def bitPos(bytes: Array[Byte], i: Int, numBits: Int): Int = {
    val m = CmsAgg.hash(bytes, SeedBase + i) % numBits
    (if (m < 0) m + numBits else m).toInt
  }

  /** Set all k bits for an item (mutates `bits`). */
  def add(bits: Array[Long], k: Int, bytes: Array[Byte]): Unit = {
    val numBits = bits.length * 64
    var i = 0
    while (i < k) {
      val p = bitPos(bytes, i, numBits)
      bits(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  /** Membership probe: true iff all k bits are set. Static and
    * codegen-callable — [[BloomContains]] emits a direct call.
    */
  def contains(bits: Array[Long], k: Int, bytes: Array[Byte]): Boolean = {
    val numBits = bits.length * 64
    var i = 0
    while (i < k) {
      val p = bitPos(bytes, i, numBits)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Column probe against a driver-collected bitset. */
  def containsC(bits: Array[Long], k: Int, item: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(BloomContains(bits, k, ColumnBridge.expression(item)))
  }
}

/** Scalar membership probe against a fixed (driver-collected) Bloom
  * bitset. The bitset rides into generated code as a reference object
  * — one shared long[] per executor, NOT a per-row literal — so the
  * probe stays inside whole-stage codegen and the broadcast cost is
  * the filter's m/8 bytes once per task. This is the 100 TB probe
  * shape: scan + codegen'd bit test, zero shuffle, zero join.
  */
case class BloomContains(bits: Array[Long], k: Int, child: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_contains item must be StringType, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else BloomAgg.contains(bits, k, v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |boolean ${ev.isNull} = ${c.isNull};
      |boolean ${ev.value} = false;
      |if (!${ev.isNull}) {
      |  ${ev.value} = graft.functions.BloomAgg.contains(
      |    $bitsRef, $k, ${c.value}.getBytes());
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_bloom_contains"

  // Array[Long] compares by reference under the case-class default, so
  // two semantically identical probes would defeat canonicalization /
  // common-subexpression elimination and each re-serialize the bitset
  // (ADVICE r11). Compare the bitset by content instead.
  override def equals(other: Any): Boolean = other match {
    case BloomContains(oBits, oK, oChild) =>
      k == oK && child == oChild && java.util.Arrays.equals(bits, oBits)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(Int.box(java.util.Arrays.hashCode(bits)),
      Int.box(k), child)
}
