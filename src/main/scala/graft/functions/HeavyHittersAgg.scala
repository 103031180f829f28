package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries top-k candidate aggregate over a LONG key column.
  *
  * Buffer = at most `k` (key, counter) pairs. Update is the classic
  * MG step: increment a tracked key, open a new counter while < k
  * keys are tracked, otherwise decrement ALL counters (dropping
  * zeros). Merge adds counters pairwise, then restores the size bound
  * by subtracting the (k+1)-largest counter from every entry and
  * discarding non-positives — the mergeable-summaries reduction,
  * which preserves the MG guarantee: every key with true frequency
  * > n/k SURVIVES in the summary (counters under-estimate by at most
  * n/k, and only keys that frequent can stay positive through the
  * worst-case decrements).
  *
  * That guarantee is what makes the two-pass heavy-hitter query
  * exact: pass 1 produces ≤ k candidate keys from a fixed ~k·16-byte
  * buffer per partition (vs a full groupBy whose shuffle carries
  * every distinct key — at 100 TB the difference between bytes and
  * terabytes moved), pass 2 recounts ONLY the candidates exactly and
  * applies the frequency threshold, so false candidates fall out and
  * true heavy hitters can never be missing.
  *
  * eval returns the candidate keys ordered by (estimate desc, key
  * asc) — estimates are not exposed; the contract is the candidate
  * SET, pass 2 owns the numbers.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] with UnaryLike[Expression] {
  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  override def prettyName: String = "misra_gries_topk"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      if (buf.contains(key)) buf(key) += 1L
      else if (buf.size < k) buf(key) = 1L
      else {
        // decrement-all; k is small by construction so O(k) is fine
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (kk, c) => if (c == 1L) dead += kk else buf(kk) = c - 1L }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.LongMap[Long], b2: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b2.foreachEntry { (kk, c) => b1(kk) = b1.getOrElse(kk, 0L) + c }
    if (b1.size > k) {
      val counts = b1.values.toArray.sortInPlace()(Ordering.Long.reverse)
      val sub = counts(k) // (k+1)-largest
      val dead = mutable.ArrayBuffer.empty[Long]
      b1.foreachEntry { (kk, c) => if (c - sub <= 0L) dead += kk else b1(kk) = c - sub }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val keys = buf.toArray.sortBy { case (kk, c) => (-c, kk) }.map(_._1)
    new GenericArrayData(keys)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (kk, c) => bb.putLong(kk); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m(bb.getLong) = bb.getLong; i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
