package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Custom aggregate: 64-bit SimHash from a column of per-item hashes
  * (e.g. `xxhash64(shingle)`). Buffer = 64 bit-counters + item count;
  * the final fingerprint sets bit b iff items with bit b set are the
  * majority.
  *
  * Versus 64 separate `sum(...)` aggregate columns: one aggregate
  * function with a 520-byte buffer instead of a 65-column row through
  * the partial/final shuffle, and the per-item update is a tight
  * primitive loop — the `TypedImperativeAggregate` extension shape
  * Spark itself uses for percentile/HLL sketches.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "simhash_agg"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) { buf(b) += (h >>> b) & 1L; b += 1 }
      buf(64) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val total = buf(64)
    var sim = 0L
    var b = 0
    while (b < 64) { if (buf(b) * 2 > total) sim |= 1L << b; b += 1 }
    sim
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SimHashAgg =
    copy(child = c)
}
