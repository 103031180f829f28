package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin rolling polynomial hash of a string column:
  * `acc := (acc * mult + codeUnit) % mod` folded left-to-right over the
  * UTF-16 code units.
  *
  * Why a custom Expression (SURVEY.md §6 extension ladder): the
  * recurrence is order-dependent, so it has no `functions._`
  * formulation short of an `aggregate` higher-order function over
  * `split(text, "")` — a CodegenFallback that allocates one
  * single-character UTF8String PER CHARACTER and interprets the lambda
  * per element. In a module whose doctrine is "corpus scans stay in
  * whole-stage codegen" (graft.text.TextOps), the fingerprint pass was
  * the one interpreted straggler; this compiles to a tight primitive
  * loop inside the generated stage.
  *
  * Semantics are bit-identical to the old HOF formulation
  * (`aggregate(filter(split(c, ""), length > 0), 0L,
  * (acc, ch) => (acc*31 + ascii(ch)) % m)`): Java-regex `split("")`
  * yields one UTF-16 code unit per element and `ascii` returns the
  * leading codepoint — equal to the code unit for every BMP character
  * (lone surrogates from supplementary chars also read back as
  * themselves). The default mod 1e9+7 keeps `acc * 31 + cu` inside
  * int64, so an external SQL engine reproduces the fold without
  * overflow (the DuckDB oracle iterates codepoints, which coincides
  * with code units on BMP-only corpora like the test tables).
  */
case class RollingHashExpr(child: Expression, mult: Long = 31L, mod: Long = 1000000007L)
    extends UnaryExpression {

  override def prettyName: String = "rolling_hash"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * mult + s.charAt(i).toLong) % mod
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName everything: whole-stage codegen inlines all expressions
      // of a stage into one Java method, where fixed locals collide.
      val s = ctx.freshName("s"); val acc = ctx.freshName("acc")
      val len = ctx.freshName("len"); val k = ctx.freshName("k")
      s"""
      |java.lang.String $s = $c.toString();
      |long $acc = 0L;
      |int $len = $s.length();
      |for (int $k = 0; $k < $len; $k++) {
      |  $acc = ($acc * ${mult}L + (long) $s.charAt($k)) % ${mod}L;
      |}
      |${ev.value} = $acc;
      |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
