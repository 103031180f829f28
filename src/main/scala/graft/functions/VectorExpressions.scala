package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with `doGenCode`) for the hot vector
  * kernels over `array<float>` columns.
  *
  * Rationale (SURVEY.md §6): the `aggregate`/`zip_with` formulations in
  * [[VectorOps]] are higher-order functions — CodegenFallback, i.e.
  * interpreted with per-element boxing and a closure call per step. A
  * 100 TB scoring or similarity pass evaluates these per row; a custom
  * BinaryExpression compiles to a tight primitive `for` loop inside
  * whole-stage codegen — the preferred extension shape (custom
  * Expression > UDF) when built-in operators can't express the kernel
  * efficiently.
  *
  * Element nulls are not expected (training vectors / embeddings are
  * dense); a null element reads as 0.0 rather than poisoning the row,
  * matching the cost model of dense numeric kernels.
  */
private[graft] trait VectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  @transient protected lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient protected lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def getL(x: ArrayData, i: Int): Double =
    if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
  protected def getR(y: ArrayData, i: Int): Double =
    if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)

  /** Java element-read snippets, specialized at codegen time. The loop
    * variable must be a `ctx.freshName` — whole-stage codegen inlines
    * every expression of a projection into ONE Java method, so fixed
    * local names collide as soon as two vector kernels share a stage
    * (e.g. the 10-centroid literal argmin), and Janino's compile error
    * silently drops the whole stage back to interpreted execution.
    */
  protected def genGetL(a: String, i: String): String =
    if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
  protected def genGetR(b: String, i: String): String =
    if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
}

/** Σ a_i * b_i in double precision, sequential order. */
case class DotProductExpr(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += getL(x, i) * getR(y, i); i += 1 }
    s
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  $s += ${genGetL(a, i)} * ${genGetR(b, i)};
      |}
      |${ev.value} = $s;
      |""".stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (a_i - b_i)^2 in double precision. */
case class DistSqExpr(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "vec_distsq"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = getL(x, i) - getR(y, i); s += d * d; i += 1 }
    s
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $d = ${genGetL(a, i)} - ${genGetR(b, i)};
      |  $s += $d * $d;
      |}
      |${ev.value} = $s;
      |""".stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cos(a, b) = a·b / (||a|| ||b||), 0.0 when either norm is 0 — dot and
  * both norms accumulated in ONE pass over the pair.
  */
case class CosineSimExpr(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "vec_cosine"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = getL(x, i); val yi = getR(y, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else dot / nn
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi"); val nn = ctx.freshName("nn")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $dot = 0.0, $na = 0.0, $nb = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $xi = ${genGetL(a, i)};
      |  double $yi = ${genGetR(b, i)};
      |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
      |}
      |double $nn = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
      |${ev.value} = ($nn == 0.0) ? 0.0 : $dot / $nn;
      |""".stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Literal-matrix mat-vec: `out[j] = Σ_k M[j][k] · v[k]` — the OPQ
  * rotation kernel ([[graft.similarity.Opq]]). The matrix rides along
  * as a REFERENCED constant (`ctx.addReferenceObj`), so the expression
  * tree is ONE node and the generated code a tight double loop. The
  * alternative — dim² unrolled `lit()` multiply-adds — is semantically
  * identical but its analysis + Janino compile time dominates whole
  * queries at dim = 64 (measured ~25 s per planned pipeline).
  */
case class MatVecLitExpr(matrix: Array[Array[Double]],
                         child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "vec_matvec_lit"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${other.sql}")
  }

  @transient private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Double](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      val m = math.min(row.length, n)
      var s = 0.0; var k = 0
      while (k < m) {
        s += row(k) * (if (childIsFloat) v.getFloat(k).toDouble else v.getDouble(k))
        k += 1
      }
      out(j) = s; j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("matVecLit", matrix, "double[][]")
      val out = ctx.freshName("out"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val s = ctx.freshName("s")
      val row = ctx.freshName("row"); val lim = ctx.freshName("lim")
      val get = if (childIsFloat) s"(double) $c.getFloat($k)" else s"$c.getDouble($k)"
      s"""
      |double[] $out = new double[$m.length];
      |for (int $j = 0; $j < $m.length; $j++) {
      |  double[] $row = $m[$j];
      |  int $lim = java.lang.Math.min($row.length, $c.numElements());
      |  double $s = 0.0;
      |  for (int $k = 0; $k < $lim; $k++) {
      |    $s += $row[$k] * $get;
      |  }
      |  $out[$j] = $s;
      |}
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): Expression =
    copy(child = newChild)
}

/** Argmin-distance centroid over a LITERAL centroid table, returning
  * the id at the argmin position (first-min tie — the same rule
  * `array_position(dists, array_min(dists))` applies, which is the
  * rule an orderBy(dist, id) window would). One expression node with
  * the table as a referenced constant: the unrolled formulation built
  * ksub·(dim + slice) lit() nodes PER SUBSPACE and its analysis +
  * Janino time dominated the PQ/IVF planning path (~20 s per trained
  * pipeline at sf0.1).
  */
case class NearestCentroidExpr(ids: Array[Int], cents: Array[Array[Double]],
                               child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "vec_nearest_centroid"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${other.sql}")
  }

  @transient private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var best = Double.MaxValue; var bestP = 0; var p = 0
    while (p < cents.length) {
      val c = cents(p); val m = math.min(c.length, n)
      var s = 0.0; var k = 0
      while (k < m) {
        val d = (if (childIsFloat) v.getFloat(k).toDouble else v.getDouble(k)) - c(k)
        s += d * d; k += 1
      }
      if (s < best) { best = s; bestP = p }
      p += 1
    }
    ids(bestP)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val idsRef = ctx.addReferenceObj("ncIds", ids, "int[]")
      val centsRef = ctx.addReferenceObj("ncCents", cents, "double[][]")
      val best = ctx.freshName("best"); val bestP = ctx.freshName("bestP")
      val p = ctx.freshName("p"); val k = ctx.freshName("k")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val row = ctx.freshName("row"); val lim = ctx.freshName("lim")
      val get = if (childIsFloat) s"(double) $c.getFloat($k)" else s"$c.getDouble($k)"
      s"""
      |double $best = Double.MAX_VALUE; int $bestP = 0;
      |for (int $p = 0; $p < $centsRef.length; $p++) {
      |  double[] $row = $centsRef[$p];
      |  int $lim = java.lang.Math.min($row.length, $c.numElements());
      |  double $s = 0.0;
      |  for (int $k = 0; $k < $lim; $k++) {
      |    double $d = $get - $row[$k];
      |    $s += $d * $d;
      |  }
      |  if ($s < $best) { $best = $s; $bestP = $p; }
      |}
      |${ev.value} = $idsRef[$bestP];
      |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ asymmetric (ADC) squared distance between a raw vector and an
  * m-code column against LITERAL codebooks:
  * `Σ_s distSq(vec[s·sub .. ), books[s][codes[s]])`, subspaces summed
  * in ascending order (bit-compatible with the left-fold the unrolled
  * formulation used). Same referenced-constant rationale as
  * [[NearestCentroidExpr]].
  */
case class AdcDistExpr(books: Array[Array[Array[Double]]],
                       left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "vec_adc_dist"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
            ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<int>), got ${l.sql}, ${r.sql}")
    }

  @transient private lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val sub: Int = books(0)(0).length

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]; val codes = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    var total = 0.0; var s = 0
    while (s < books.length && s < codes.numElements()) {
      val row = books(s)(codes.getInt(s))
      var k = 0
      while (k < row.length && s * sub + k < n) {
        val i = s * sub + k
        val d = (if (leftIsFloat) v.getFloat(i).toDouble else v.getDouble(i)) - row(k)
        total += d * d; k += 1
      }
      s += 1
    }
    total
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val booksRef = ctx.addReferenceObj("adcBooks", books, "double[][][]")
      val total = ctx.freshName("total"); val s = ctx.freshName("s")
      val k = ctx.freshName("k"); val d = ctx.freshName("d")
      val row = ctx.freshName("row"); val i = ctx.freshName("i")
      val get = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
      |double $total = 0.0;
      |for (int $s = 0; $s < $booksRef.length && $s < $b.numElements(); $s++) {
      |  double[] $row = $booksRef[$s][$b.getInt($s)];
      |  for (int $k = 0; $k < $row.length; $k++) {
      |    int $i = $s * $sub + $k;
      |    if ($i >= $a.numElements()) break;
      |    double $d = $get - $row[$k];
      |    $total += $d * $d;
      |  }
      |}
      |${ev.value} = $total;
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
