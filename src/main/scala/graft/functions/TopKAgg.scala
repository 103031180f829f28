package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: the k best (score, id) pairs per group by
  * (score DESC, id ASC) — exactly the `row_number() OVER (ORDER BY
  * score DESC, id)` ranking, computed in a fixed k-entry buffer with
  * map-side partial aggregation.
  *
  * This is the scale shape for "top-k per probe" over a scored join:
  * the window form shuffles and SORTS every scored pair (probes ×
  * corpus rows — at a 2000-probe × 800k-corpus brute-force ground
  * truth, 1.6G rows through one exchange), while this aggregate folds
  * each partition's pairs into k-row heaps locally, so the shuffle
  * carries groups × k rows. The scored pairs are still EVALUATED
  * (exactness is the point of a brute-force baseline); they are just
  * never materialized through a shuffle.
  *
  * eval returns array<struct<id:long, score:double>> best-first; ties
  * beyond position k are CUT (row_number semantics, deterministic via
  * the id tie-break), unlike the rank()-based ADC candidate windows
  * whose tie-group inclusion is load-bearing.
  */
case class TopKByAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {
  require(k >= 1, s"topk_by needs k >= 1, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def prettyName: String = "topk_by"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  /** Heap head = the WORST kept entry (lowest score, then highest id),
    * so a bounded insert is one head comparison + one replace.
    */
  private def worstFirst: Ordering[(Double, Long)] = TopKByAgg.WorstFirst

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def insert(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // dequeueAll drains worst-first; reverse for best-first output
    val drained: Seq[(Double, Long)] = buf.clone().dequeueAll
    val out: Array[Any] = drained.reverse.map(e =>
      new GenericInternalRow(Array[Any](e._2, e._1))).toArray
    new GenericArrayData(out)
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByAgg =
    copy(score = newLeft, id = newRight)
}

object TopKByAgg {
  /** Worse = lower score, then higher id ("greater" dequeues first). */
  private[functions] object WorstFirst extends Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}

/** Index-filtered top-k in ONE aggregate — the bounded-probe form of
  * the LSH / IVF candidate pipelines: each corpus row carries a small
  * array of integer KEYS (its IVF list id, or its 8 table·bucket LSH
  * codes — computed by the SAME engine expressions that built the
  * probe side, so matching is bit-exact), and `keyProbes(key)` lists
  * the probes whose index probes that key. A row scores (primitive
  * cosine + bounded heap, as [[BruteTopKAgg]]) against exactly the
  * probes it shares a key with — a per-row visited stamp dedupes
  * multi-key matches, mirroring the pair `distinct()` of the join
  * formulation.
  *
  * Why: the join pipelines materialize candidate PAIRS through a
  * shuffle and rank them with a full sort window — probes × scanned
  * fraction rows (8M at the sf1 recall contract, 12-17 s each). Here
  * nothing pair-shaped ever moves: one corpus scan, P×k-entry heap
  * partials. Correct ONLY when the probe set is driver-bounded (the
  * recall contracts cap probes); the general unbounded-probe
  * operators keep the join shape.
  */
case class KeyedTopKAgg(
    vec: Expression,
    id: Expression,
    keys: Expression,
    probeIds: Array[Long],
    probeVecs: Array[Array[Double]],
    keyProbes: Array[Array[Int]],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[mutable.PriorityQueue[(Double, Long)]]]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {
  require(k >= 1, s"keyed_topk needs k >= 1, got $k")
  require(probeIds.length == probeVecs.length, "probe ids/vecs length mismatch")

  override def first: Expression = vec
  override def second: Expression = id
  override def third: Expression = keys

  override def prettyName: String = "keyed_topk"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("probe_id", LongType, nullable = false),
      StructField("rk", IntegerType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val vecIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val probeNorms: Array[Double] =
    probeVecs.map { p =>
      var s = 0.0; var i = 0
      while (i < p.length) { s += p(i) * p(i); i += 1 }
      math.sqrt(s)
    }
  // per-row dedupe stamps (update() is single-threaded per buffer, but
  // buffers can coexist per task — keep the scratch per-instance)
  @transient private lazy val stamp: Array[Int] = new Array[Int](probeIds.length)
  @transient private var stampGen: Int = 0

  override def createAggregationBuffer(): Array[mutable.PriorityQueue[(Double, Long)]] =
    Array.fill(probeIds.length)(
      mutable.PriorityQueue.empty[(Double, Long)](TopKByAgg.WorstFirst))

  private def insert(q: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (q.size < k) q.enqueue(e)
    else if (TopKByAgg.WorstFirst.compare(e, q.head) < 0) { q.dequeue(); q.enqueue(e) }
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def update(
      buf: Array[mutable.PriorityQueue[(Double, Long)]],
      input: InternalRow): Array[mutable.PriorityQueue[(Double, Long)]] = {
    val v = vec.eval(input)
    val i = id.eval(input)
    val ks = keys.eval(input)
    if (v != null && i != null && ks != null) {
      val ad = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = ad.numElements()
      val x = new Array[Double](n)
      var j = 0
      while (j < n) {
        x(j) = if (vecIsFloat) ad.getFloat(j).toDouble else ad.getDouble(j)
        j += 1
      }
      var nx = 0.0
      j = 0
      while (j < n) { nx += x(j) * x(j); j += 1 }
      nx = math.sqrt(nx)
      val rowId = i.asInstanceOf[Long]
      val ka = ks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      stampGen += 1
      var ki = 0
      while (ki < ka.numElements()) {
        val key = ka.getInt(ki)
        if (key >= 0 && key < keyProbes.length) {
          val plist = keyProbes(key)
          var pi = 0
          while (pi < plist.length) {
            val p = plist(pi)
            if (stamp(p) != stampGen && probeIds(p) != rowId) {
              stamp(p) = stampGen
              val pv = probeVecs(p)
              val d = math.min(n, pv.length)
              var dot = 0.0
              j = 0
              while (j < d) { dot += x(j) * pv(j); j += 1 }
              val nn = nx * probeNorms(p)
              val c = if (nn == 0.0) 0.0 else dot / nn
              val q = buf(p)
              if (q.size < k || c >= q.head._1 - 1e-6) insert(q, (round6(c), rowId))
            }
            pi += 1
          }
        }
        ki += 1
      }
    }
    buf
  }

  override def merge(
      b1: Array[mutable.PriorityQueue[(Double, Long)]],
      b2: Array[mutable.PriorityQueue[(Double, Long)]])
      : Array[mutable.PriorityQueue[(Double, Long)]] = {
    var p = 0
    while (p < b1.length) {
      b2(p).foreach(insert(b1(p), _))
      p += 1
    }
    b1
  }

  override def eval(buf: Array[mutable.PriorityQueue[(Double, Long)]]): Any = {
    val out = Seq.newBuilder[Any]
    var p = 0
    while (p < buf.length) {
      val drained: Seq[(Double, Long)] = buf(p).clone().dequeueAll
      val best = drained.reverse
      var r = 0
      best.foreach { case (s, i) =>
        r += 1
        out += new GenericInternalRow(Array[Any](probeIds(p), r, i, s))
      }
      p += 1
    }
    new GenericArrayData(out.result().toArray)
  }

  override def serialize(buf: Array[mutable.PriorityQueue[(Double, Long)]]): Array[Byte] = {
    val total = buf.map(_.size).sum
    val bb = ByteBuffer.allocate(4 + buf.length * 4 + total * 16)
    bb.putInt(buf.length)
    buf.foreach { q =>
      bb.putInt(q.size)
      q.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[mutable.PriorityQueue[(Double, Long)]] = {
    val bb = ByteBuffer.wrap(bytes)
    val np = bb.getInt
    Array.fill(np) {
      val n = bb.getInt
      val q = mutable.PriorityQueue.empty[(Double, Long)](TopKByAgg.WorstFirst)
      var i = 0
      while (i < n) { q.enqueue((bb.getDouble, bb.getLong)); i += 1 }
      q
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KeyedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KeyedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): KeyedTopKAgg =
    copy(vec = newFirst, id = newSecond, keys = newThird)
}

/** Whole brute-force top-k in ONE aggregate: the probe set (ids +
  * vectors) is a referenced constant — the same driver-local-bytes
  * pattern as the IVF centroid and Bloom-bitmap expressions — and the
  * corpus streams through a single scan. Each input row computes its
  * cosine against every probe in a primitive double[] loop and feeds
  * per-probe k-entry heaps; partials merge as P×k entries.
  *
  * Why not join-then-aggregate: the broadcast non-equi join
  * materializes probes × corpus ROWS (1.6G at a 2000×800k ground
  * truth) and a TypedImperativeAggregate evaluates its child
  * expressions INTERPRETED per joined row — JoinedRow indirection,
  * boxed array reads and BigDecimal rounding per pair. Here the same
  * arithmetic runs on unwrapped primitive arrays: the scan is the
  * corpus, not the cross product.
  *
  * Scores are rounded HALF_UP to 6 digits BEFORE ranking (BigDecimal —
  * bit-identical to Spark's and DuckDB's `round(x, 6)`), preserving the
  * established brute-force contract ordering (cosine desc, id asc).
  * Self-pairs (id == probe id) are skipped, matching the join's
  * `vec_id =!= probe_id` filter. eval returns a flat best-first
  * array<struct<probe_id, rk, neighbor_id, cosine>> ready to inline.
  */
case class BruteTopKAgg(
    vec: Expression,
    id: Expression,
    probeIds: Array[Long],
    probeVecs: Array[Array[Double]],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[mutable.PriorityQueue[(Double, Long)]]]
  with BinaryLike[Expression] {
  require(k >= 1, s"brute_topk needs k >= 1, got $k")
  require(probeIds.length == probeVecs.length, "probe ids/vecs length mismatch")

  override def left: Expression = vec
  override def right: Expression = id

  override def prettyName: String = "brute_topk"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("probe_id", LongType, nullable = false),
      StructField("rk", IntegerType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val vecIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val probeNorms: Array[Double] =
    probeVecs.map { p =>
      var s = 0.0; var i = 0
      while (i < p.length) { s += p(i) * p(i); i += 1 }
      math.sqrt(s)
    }

  override def createAggregationBuffer(): Array[mutable.PriorityQueue[(Double, Long)]] =
    Array.fill(probeIds.length)(
      mutable.PriorityQueue.empty[(Double, Long)](TopKByAgg.WorstFirst))

  private def insert(q: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (q.size < k) q.enqueue(e)
    else if (TopKByAgg.WorstFirst.compare(e, q.head) < 0) { q.dequeue(); q.enqueue(e) }
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def update(
      buf: Array[mutable.PriorityQueue[(Double, Long)]],
      input: InternalRow): Array[mutable.PriorityQueue[(Double, Long)]] = {
    val v = vec.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) {
      val ad = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = ad.numElements()
      val x = new Array[Double](n)
      var j = 0
      while (j < n) {
        x(j) = if (vecIsFloat) ad.getFloat(j).toDouble else ad.getDouble(j)
        j += 1
      }
      var nx = 0.0
      j = 0
      while (j < n) { nx += x(j) * x(j); j += 1 }
      nx = math.sqrt(nx)
      val rowId = i.asInstanceOf[Long]
      var p = 0
      while (p < probeIds.length) {
        if (probeIds(p) != rowId) {
          val pv = probeVecs(p)
          val d = math.min(n, pv.length)
          var dot = 0.0
          j = 0
          while (j < d) { dot += x(j) * pv(j); j += 1 }
          val nn = nx * probeNorms(p)
          val c = if (nn == 0.0) 0.0 else dot / nn
          // BigDecimal rounding only near the cutoff: a raw score more
          // than one quantum below the kept minimum cannot round to ≥ it
          // (round6 moves a value by at most 0.5e-6), so the vast
          // majority of pairs skip the decimal path entirely.
          val q = buf(p)
          if (q.size < k || c >= q.head._1 - 1e-6) insert(q, (round6(c), rowId))
        }
        p += 1
      }
    }
    buf
  }

  override def merge(
      b1: Array[mutable.PriorityQueue[(Double, Long)]],
      b2: Array[mutable.PriorityQueue[(Double, Long)]])
      : Array[mutable.PriorityQueue[(Double, Long)]] = {
    var p = 0
    while (p < b1.length) {
      b2(p).foreach(insert(b1(p), _))
      p += 1
    }
    b1
  }

  override def eval(buf: Array[mutable.PriorityQueue[(Double, Long)]]): Any = {
    val out = Seq.newBuilder[Any]
    var p = 0
    while (p < buf.length) {
      val drained: Seq[(Double, Long)] = buf(p).clone().dequeueAll
      val best = drained.reverse
      var r = 0
      best.foreach { case (s, i) =>
        r += 1
        out += new GenericInternalRow(Array[Any](probeIds(p), r, i, s))
      }
      p += 1
    }
    new GenericArrayData(out.result().toArray)
  }

  override def serialize(buf: Array[mutable.PriorityQueue[(Double, Long)]]): Array[Byte] = {
    val total = buf.map(_.size).sum
    val bb = ByteBuffer.allocate(4 + buf.length * 4 + total * 16)
    bb.putInt(buf.length)
    buf.foreach { q =>
      bb.putInt(q.size)
      q.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[mutable.PriorityQueue[(Double, Long)]] = {
    val bb = ByteBuffer.wrap(bytes)
    val np = bb.getInt
    Array.fill(np) {
      val n = bb.getInt
      val q = mutable.PriorityQueue.empty[(Double, Long)](TopKByAgg.WorstFirst)
      var i = 0
      while (i < n) { q.enqueue((bb.getDouble, bb.getLong)); i += 1 }
      q
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BruteTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BruteTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BruteTopKAgg =
    copy(vec = newLeft, id = newRight)
}
