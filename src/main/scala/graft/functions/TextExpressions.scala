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

/** Distinct 64-bit rolling hashes of every `w`-consecutive-token
  * window of a token-array column — the hot loop of exact-substring
  * dedup ([[graft.dedup.Substring]]).
  *
  * Why a custom Expression: the `transform(sequence(...), slice+
  * concat_ws)` formulation builds one ~90-byte window STRING per token
  * position through an interpreted HOF lambda (CodegenFallback), then
  * shuffles those strings as join keys. This expression hashes each
  * token once (FNV-1a 64 over its UTF-8 bytes) and rolls a polynomial
  * over the token hashes — O(tokens) total, not O(tokens × w) — inside
  * codegen, and downstream shuffles carry 8-byte longs. Distinctness
  * (a window repeated INSIDE one doc counts once) is folded into the
  * same pass via an insertion-ordered set.
  *
  * The hash substitutes for window-text equality: two windows collide
  * with probability ~2⁻⁶⁴ per pair (~10⁻⁷ corpus-wide at sf0.1). The
  * DuckDB oracle groups by window TEXT, so a collision would surface
  * as a correctness diff rather than pass silently.
  */
case class TokenWindowHashExpr(child: Expression, w: Int,
                               distinct: Boolean = true)
    extends UnaryExpression {

  require(w >= 1, s"window width must be positive, got $w")

  override def prettyName: String = "token_window_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenWindowHashExpr.windowHashes(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w, distinct)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenWindowHashExpr$$.MODULE$$.windowHashes($c, $w, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenWindowHashExpr {
  /** FNV-64 prime — the polynomial base; arithmetic wraps mod 2⁶⁴. */
  final val B = 1099511628211L

  /** FNV-1a 64 over the UTF-8 bytes of one token. */
  def fnv64(s: UTF8String): Long = {
    var h = -3750763034362895579L // 0xcbf29ce484222325
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= B
      i += 1
    }
    h
  }

  /** Rolling window hashes; `distinct = true` de-duplicates in
    * first-occurrence order (set-semantics consumers), `false` keeps
    * one hash PER POSITION in order (span/run consumers, where array
    * index == window start). Empty when the doc has fewer than `w`
    * tokens. Shared by eval and codegen.
    */
  def windowHashes(arr: org.apache.spark.sql.catalyst.util.ArrayData, w: Int,
                   distinct: Boolean)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = fnv64(arr.getUTF8String(i)); i += 1 }
    var pow = 1L
    i = 0
    while (i < w - 1) { pow *= B; i += 1 }
    val all = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * B + th(i); i += 1 }
    all(0) = h
    i = 1
    while (i <= n - w) {
      h = (h - th(i - 1) * pow) * B + th(i + w - 1)
      all(i) = h
      i += 1
    }
    if (!distinct)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(all)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < all.length) { seen.add(all(i)); i += 1 }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
