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
