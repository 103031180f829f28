package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** OPQ M-step correlation matrix in ONE corpus scan: for each row,
  * encode the ROTATED vector against the current codebooks (per-
  * subspace nearest centroid), reconstruct its quantization ŷ, and
  * accumulate the d×d sum A += x·ŷᵀ over the ORIGINAL vector x. The
  * orthogonal Procrustes step of OPQ's alternating minimization
  * (Ge et al., CVPR 2013: min_R Σ‖R·x − ŷ‖² = max_R tr(R·A)) then
  * needs only this matrix — 4096 doubles for dim 64 — on the driver,
  * where an SVD of A gives R = V·Uᵀ.
  *
  * Scale shape: codebooks ride along as a referenced constant (m ×
  * ksub × sub doubles), the update is primitive double[] loops
  * (ksub·dim flops to encode + dim² to accumulate), partials merge by
  * matrix addition — the whole E+M data pass is one aggregate with
  * map-side combine, nothing corpus-sized ever moves.
  */
/** Uncentered second-moment (Gram) matrix Σ x·xᵀ of a vector column in
  * one scan — d×d doubles to the driver for PCA-style eigenanalysis
  * (OPQ's parametric init). Same referenced-constant/primitive-loop
  * discipline as [[OpqMStepAgg]].
  */
case class GramAgg(
    vec: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(dim > 0, s"gram needs dim > 0, got $dim")

  override def child: Expression = vec
  override def prettyName: String = "vec_gram"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim * dim)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = vec.eval(input)
    if (v != null) {
      val ad = v.asInstanceOf[ArrayData]
      val n = math.min(ad.numElements(), dim)
      val x = new Array[Double](dim)
      var i = 0
      while (i < n) {
        x(i) = if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
        i += 1
      }
      var j = 0
      while (j < dim) {
        val xj = x(j)
        if (xj != 0.0) {
          val row = j * dim
          var k = j
          while (k < dim) { buf(row + k) += xj * x(k); k += 1 }
        }
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    // only the upper triangle was accumulated; mirror it
    val out = buf.clone()
    var j = 0
    while (j < dim) {
      var k = j + 1
      while (k < dim) { out(k * dim + j) = out(j * dim + k); k += 1 }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(vec = newChild)
}

case class OpqMStepAgg(
    orig: Expression,
    rot: Expression,
    books: Array[Array[Array[Double]]],
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with BinaryLike[Expression] {
  require(dim > 0 && books.nonEmpty && dim % books.length == 0,
    s"dim $dim not divisible by m ${books.length}")

  override def left: Expression = orig
  override def right: Expression = rot

  override def prettyName: String = "opq_mstep"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val m = books.length
  @transient private lazy val sub = dim / m
  @transient private lazy val origIsFloat: Boolean =
    orig.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rotIsFloat: Boolean =
    rot.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Buffer = flattened d×d A plus three distortion terms appended:
    * Σ‖y‖², Σ ŷᵀy, Σ‖ŷ‖² — so each M-step pass also yields the exact
    * quantization distortion Σ‖y − ŷ‖² = b₀ − 2·b₁ + b₂ for free.
    */
  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim * dim + 3)

  private def toDoubles(ad: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = math.min(ad.numElements(), dim)
    val out = new Array[Double](dim)
    var i = 0
    while (i < n) {
      out(i) = if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
      i += 1
    }
    out
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val o = orig.eval(input)
    val r = rot.eval(input)
    if (o != null && r != null) {
      val x = toDoubles(o.asInstanceOf[ArrayData], origIsFloat)
      val y = toDoubles(r.asInstanceOf[ArrayData], rotIsFloat)
      // reconstruct ŷ: per subspace, nearest codebook centroid of y's slice
      val yhat = new Array[Double](dim)
      var s = 0
      while (s < m) {
        val book = books(s)
        val base = s * sub
        var bestC = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          val cent = book(c)
          var d2 = 0.0
          var t = 0
          while (t < sub) { val d = y(base + t) - cent(t); d2 += d * d; t += 1 }
          if (d2 < bestD) { bestD = d2; bestC = c }
          c += 1
        }
        val cent = book(bestC)
        var t = 0
        while (t < sub) { yhat(base + t) = cent(t); t += 1 }
        s += 1
      }
      var j = 0
      while (j < dim) {
        val xj = x(j)
        if (xj != 0.0) {
          val row = j * dim
          var k = 0
          while (k < dim) { buf(row + k) += xj * yhat(k); k += 1 }
        }
        j += 1
      }
      val d2 = dim * dim
      var t2 = 0
      while (t2 < dim) {
        buf(d2) += y(t2) * y(t2)
        buf(d2 + 1) += yhat(t2) * y(t2)
        buf(d2 + 2) += yhat(t2) * yhat(t2)
        t2 += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OpqMStepAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OpqMStepAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OpqMStepAgg =
    copy(orig = newLeft, rot = newRight)
}
