package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature aggregate: over a group's 64-bit shingle hashes,
  * the k-vector `sig(i) = min over h of xxhash64(i, h)` — in ONE
  * aggregate with an `Array[Long]` buffer.
  *
  * Value-identical to the k-column formulation
  * `agg(min(xxhash64(lit(0), h)), …, min(xxhash64(lit(k-1), h)))`:
  * Spark's `xxhash64(a, b)` chains `XXH64.hashInt(a, 42)` into
  * `XXH64.hashLong(b, ·)`, which is exactly what [[update]] computes
  * from precomputed per-slot seeds. The k-column form generates an
  * update method with k inlined hash+min branches — seconds of janino
  * per plan shape at k=128 and a wide fixed-width buffer row; this
  * buffer is one object, the update a tight loop, and the plan an
  * ObjectHashAggregate (fine here: this aggregate IS the whole
  * query stage, so nothing else is knocked off codegen — the same
  * quarantine argument as the percentile pass).
  *
  * Null inputs are skipped, matching `min`'s semantics; a group with
  * no non-null hashes evaluates to null, matching the k-column form.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numHashes >= 1, s"numHashes must be positive: $numHashes")

  /** Seed of slot i ≡ Spark's hash state after folding the literal
    * int i into xxhash64's default seed 42. */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val hv = XXH64.hashLong(h, seeds(i))
        if (hv < buf(i)) buf(i) = hv
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  // All-MaxValue ⇒ no input ever folded (hash collisions with the
  // sentinel are impossible to distinguish but harmless: a real
  // MaxValue minimum in EVERY slot has probability ~2^-64k).
  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numHashes)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numHashes)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "minhash_agg"
}
