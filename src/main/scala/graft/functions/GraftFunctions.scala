package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge

/** Column + SQL entry points for the custom expressions.
  *
  * `register(spark)` exposes them to `spark.sql(...)` via the session
  * function registry — the lightweight path for scalar/aggregate
  * extensions (a full `SparkSessionExtensions` install is only needed
  * for planner rules/strategies, which these are not).
  */
object GraftFunctions {

  def vec_dot(a: Column, b: Column): Column = VectorOps.dot(a, b)
  def vec_cosine(a: Column, b: Column): Column = VectorOps.cosine(a, b)
  def vec_distsq(a: Column, b: Column): Column = VectorOps.distSq(a, b)

  /** SimHash aggregate over a long hash column. */
  def simhash_agg(hashCol: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(hashCol)).toAggregateExpression())

  /** Karp-Rabin rolling hash of a string column (codegen). */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(c)))

  /** Distinct rolling hashes of every `w`-token window of a token
    * array (codegen; see [[TokenWindowHashExpr]]).
    */
  def token_window_hashes(toks: Column, w: Int): Column =
    ColumnBridge.column(TokenWindowHashExpr(ColumnBridge.expression(toks), w))

  /** One window hash PER POSITION (array index == window start) — the
    * span/run-consuming variant of [[token_window_hashes]].
    */
  def token_window_hashes_positional(toks: Column, w: Int): Column =
    ColumnBridge.column(
      TokenWindowHashExpr(ColumnBridge.expression(toks), w, distinct = false))

  /** All-category PII redaction of a string column (see
    * [[graft.text.Pii]]) — Column form delegates to the shared rule
    * list; the SQL registration builds the same nested RegExpReplace
    * tree at the expression level, so `pii_redact(text)` in SQL is the
    * identical codegen'd plan.
    */
  def pii_redact(c: Column): Column = graft.text.Pii.redactAll(c)

  /** Membership probe against a pre-built [[BloomSketch]] bitmap
    * (referenced-constant codegen; see [[BloomMightContainExpr]]).
    */
  def bloom_might_contain(bits: Array[Long], key: Column): Column =
    ColumnBridge.column(BloomMightContainExpr(bits, ColumnBridge.expression(key)))

  /** Misra–Gries top-k candidate keys of a long column (array<long>,
    * estimate-desc order; see [[MisraGriesAgg]]).
    */
  def mg_topk(key: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(key), k).toAggregateExpression())

  /** Exact-distinct bitmap of a dense long id column — bitset bytes,
    * mergeable by OR (see [[BitmapBuildAgg]]).
    */
  def bitmap_build(key: Column, maxId: Int): Column =
    ColumnBridge.column(
      BitmapBuildAgg(ColumnBridge.expression(key), maxId).toAggregateExpression())

  /** OR pre-built bitmaps and count — exact re-aggregation of states
    * without a data rescan (see [[BitmapOrCountAgg]]).
    */
  def bitmap_or_count(bits: Column): Column =
    ColumnBridge.column(
      BitmapOrCountAgg(ColumnBridge.expression(bits)).toAggregateExpression())

  /** OR pre-built bitmaps into one bitmap — the incremental-state
    * carrier (see [[BitmapOrAgg]]).
    */
  def bitmap_or(bits: Column): Column =
    ColumnBridge.column(
      BitmapOrAgg(ColumnBridge.expression(bits)).toAggregateExpression())

  /** Exact popcount of bitmap bytes (see [[BitmapCardExpr]]). */
  def bitmap_card(bits: Column): Column =
    ColumnBridge.column(BitmapCardExpr(ColumnBridge.expression(bits)))

  /** Exact |A∩B| of two bitmaps — AND + popcount in one pass (see
    * [[BitmapAndCardExpr]]).
    */
  def bitmap_and_card(a: Column, b: Column): Column =
    ColumnBridge.column(
      BitmapAndCardExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Bounded top-k by (score desc, id asc) — array<struct<id,score>>
    * best-first, computed with map-side k-entry heaps instead of a
    * full-sort window (see [[TopKByAgg]]).
    */
  def topk_by(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** One-scan brute-force cosine top-k against a referenced-constant
    * probe set (see [[BruteTopKAgg]]); returns a flat
    * array<struct<probe_id,rk,neighbor_id,cosine>> to inline().
    */
  def brute_topk(vec: Column, id: Column, probeIds: Array[Long],
                 probeVecs: Array[Array[Double]], k: Int): Column =
    ColumnBridge.column(
      BruteTopKAgg(ColumnBridge.expression(vec), ColumnBridge.expression(id),
        probeIds, probeVecs, k).toAggregateExpression())

  /** Index-filtered bounded-probe top-k in one corpus scan (see
    * [[KeyedTopKAgg]]); same flat output shape as [[brute_topk]].
    */
  def keyed_topk(vec: Column, id: Column, keys: Column,
                 probeIds: Array[Long], probeVecs: Array[Array[Double]],
                 keyProbes: Array[Array[Int]], k: Int): Column =
    ColumnBridge.column(
      KeyedTopKAgg(ColumnBridge.expression(vec), ColumnBridge.expression(id),
        ColumnBridge.expression(keys), probeIds, probeVecs, keyProbes, k)
        .toAggregateExpression())

  /** OPQ M-step correlation matrix Σ x·ŷᵀ (flattened row-major) in one
    * scan (see [[OpqMStepAgg]]).
    */
  def opq_mstep(orig: Column, rot: Column,
                books: Array[Array[Array[Double]]], dim: Int): Column =
    ColumnBridge.column(
      OpqMStepAgg(ColumnBridge.expression(orig), ColumnBridge.expression(rot),
        books, dim).toAggregateExpression())

  /** One-scan Σ x·xᵀ Gram matrix, flattened row-major ([[GramAgg]]). */
  def vec_gram(vec: Column, dim: Int): Column =
    ColumnBridge.column(
      GramAgg(ColumnBridge.expression(vec), dim).toAggregateExpression())

  private def piiRedactExpr(
      subject: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
    graft.text.Pii.Categories.foldLeft(subject) { case (acc, (_, pat, tag)) =>
      RegExpReplace(acc, Literal(pat), Literal(tag))
    }
  }

  /** Register all graft functions for SQL use in this session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      es => DotProductExpr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_cosine",
      es => CosineSimExpr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_distsq",
      es => DistSqExpr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash_agg",
      es => SimHashAgg(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash",
      es => RollingHashExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("pii_redact",
      es => piiRedactExpr(es.head), "scala_udf")
    // mg_topk(key, k): k must be a foldable int literal — the summary
    // size is plan-time structure, not data.
    reg.createOrReplaceTempFunction("mg_topk",
      es => MisraGriesAgg(es.head,
        es(1).eval(null).asInstanceOf[Int]).toAggregateExpression(), "scala_udf")
    // topk_by(score, id, k): k a foldable int literal, like mg_topk.
    reg.createOrReplaceTempFunction("topk_by",
      es => TopKByAgg(es.head, es(1),
        es(2).eval(null).asInstanceOf[Int]).toAggregateExpression(), "scala_udf")
  }

  /** Config-driven registration for [[graft.GraftExtensions]]
    * (`spark.sql.extensions`): same four functions, injected at session
    * build time instead of per-session `register` calls.
    */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def fn(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name), builder))
    fn("vec_dot", es => DotProductExpr(es.head, es(1)))
    fn("vec_cosine", es => CosineSimExpr(es.head, es(1)))
    fn("vec_distsq", es => DistSqExpr(es.head, es(1)))
    fn("simhash_agg", es => SimHashAgg(es.head).toAggregateExpression())
    fn("rolling_hash", es => RollingHashExpr(es.head))
    fn("pii_redact", es => piiRedactExpr(es.head))
  }
}
