package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** THE SimHash bit-extraction rule, shared by [[SimHashAgg]] and
  * [[SimHashSketch]] so the definition the DuckDB oracle replays
  * character-for-character exists exactly once:
  *   - hexMode: `field` is the first 16 hex chars of an md5 digest as
  *     a big-endian unsigned long; bit b is bit (b mod 4) of hex
  *     nibble (b div 4), counting nibbles from the FIRST hex char;
  *   - otherwise `field` is a 64-bit hash and bit b is bit b. */
private[functions] object SimHashBits {
  def isSet(field: Long, b: Int, hexMode: Boolean): Boolean =
    if (hexMode) ((field >>> (4 * (15 - b / 4))) >> (b % 4) & 1L) == 1L
    else (field >> b & 1L) == 1L
}

/** SimHash-64 sketch aggregate: per group, 64 signed bit-vote
  * counters folded in one `Array[Int]` buffer; bit b of the result is
  * set iff strictly more inputs had bit b set than clear — identical
  * to the 64-column `sum(when(bit, 1).otherwise(-1))` formulation it
  * replaces (which generated an update method with 64 inlined
  * branches; seconds of janino per plan shape), including the
  * ties-to-0 rule (vote sum 0 ⇒ bit clear).
  *
  * Two input shapes, matching [[graft.dedup.Dedup.simhashSketches]]'s
  * hash modes:
  *   - LongType: bit b is bit b of the 64-bit hash (xxhash64 mode);
  *   - StringType (md5 hex): bit b is bit (b mod 4) of hex nibble
  *     (b div 4), counting nibbles from the FIRST hex character —
  *     the engine-reproducible definition the DuckDB oracle replays.
  *
  * Null inputs are skipped (SQL `sum` semantics); a group of only
  * nulls yields sketch 0, as every vote sum is 0 — matching the
  * column form, where sum() returns null and `when(null > 0)` is
  * false for every bit.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private def hexInput: Boolean = child.dataType == StringType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val bits: Long = if (hexInput) {
        // First 16 hex chars as a big-endian unsigned 64-bit value;
        // bit b below reads nibble (b/4) = hex char (b/4) and its
        // bit (b%4).
        val s = v.asInstanceOf[UTF8String].toString
        java.lang.Long.parseUnsignedLong(s.substring(0, 16), 16)
      } else v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += (if (SimHashBits.isSet(bits, b, hexInput)) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sk = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) sk |= (1L << b)
      b += 1
    }
    sk
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * 64)
    bb.asIntBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](64)
    java.nio.ByteBuffer.wrap(bytes).asIntBuffer().get(out)
    out
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "simhash_agg"
}
