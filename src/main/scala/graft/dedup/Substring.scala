package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-substring (shared token window) deduplication — the
  * training-data op complementary to MinHash: instead of whole-doc
  * near-duplicate similarity, it flags documents that share an EXACT
  * run of `W` consecutive tokens with any other document (boilerplate,
  * licenses, copy-pasted spans). The single-machine formulation is a
  * suffix array over the whole corpus (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better"); the distributed
  * formulation here is the inverted-index equivalent: every document
  * emits its distinct token W-grams, a count aggregation finds the
  * W-grams present in ≥ 2 documents, and a join back flags the
  * documents containing them.
  *
  * 100 TB shape:
  *  - The per-doc window set is `array_distinct`-ed BEFORE the explode
  *    ([[Dedup.shinglesFromTokens]]), so a window repeated inside one
  *    long document shuffles once, not per occurrence.
  *  - The shared-window aggregation is map-side combinable (count per
  *    window over already-distinct (doc, window) pairs).
  *  - Join-back output is bounded by the input pair count — a
  *    boilerplate window in a million docs contributes one row per
  *    containing doc, never a pairwise cross product (this is the
  *    decisive difference from pair-join near-dup formulations).
  *  - Windows travel as 8-byte rolling hashes, never as strings: one
  *    codegen pass ([[graft.functions.TokenWindowHashExpr]]) hashes
  *    each token once and rolls a polynomial across positions —
  *    O(tokens) per doc — so the shared-window shuffle and the
  *    join-back carry longs (~10× narrower than the ~90-byte window
  *    text, and no interpreted HOF building strings per position;
  *    measured 15.2 → 1.4 s warm at sf0.1). The DuckDB oracle groups
  *    by window TEXT, so a hash collision (~2⁻⁶⁴ per pair) would fail
  *    the correctness gate loudly instead of passing silently.
  */
object Substring {

  /** Window width in tokens. Real pipelines use ~50 on multi-KB web
    * documents; the synthetic corpus has 10–99-token docs (median 56),
    * so 12 keeps the same "long exact run, not a common phrase"
    * character at the test scale.
    */
  val W = 12

  /** Per-document audit: total window positions, distinct windows
    * shared with ≥ 1 other document, and the resulting flag.
    */
  def substringAudit(spark: SparkSession, sfDir: String): DataFrame =
    auditOf(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** [[substringAudit]] over any (doc_id, text) frame — the spec's
    * planted-corpus entry point.
    */
  def auditOf(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        greatest(size(col("toks")) - (W - 1), lit(0)).cast("long").as("n_windows"),
        graft.functions.GraftFunctions.token_window_hashes(col("toks"), W).as("wins"))
    // distinct (doc, window-hash) pairs — distinct by construction (the
    // hash array is de-duplicated per doc inside the codegen pass)
    val docWin = toks.select(col("doc_id"), explode(col("wins")).as("win"))
    val shared = docWin.groupBy("win")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select("win")
    val perDoc = docWin.join(shared, "win")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    toks.select("doc_id", "n_windows")
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_windows"),
        (coalesce(col("n_dup"), lit(0L)) > 0).as("flagged"))
      .orderBy("doc_id")
  }

  /** Span structure of the sharing: for each flagged document, the
    * maximal RUNS of consecutive shared window positions — the unit
    * the substring-dedup literature actually removes (a shared run of
    * `r` windows is a shared span of `r + W − 1` tokens). Positions
    * whose window hash is shared collapse into runs via the
    * `pos − row_number()` grouping identity; the per-doc window
    * function is bounded by document length, so the sort never exceeds
    * one document's positions.
    */
  def substringSpans(spark: SparkSession, sfDir: String): DataFrame =
    spansOf(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** [[substringSpans]] over any (doc_id, text) frame. */
  def spansOf(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      // one hash PER POSITION (distinct = false): array index == start
      .select(col("doc_id"),
        graft.functions.GraftFunctions
          .token_window_hashes_positional(col("toks"), W).as("wins"))
    val posWin = toks.select(col("doc_id"), posexplode(col("wins")).as(Seq("pos", "win")))
    // shared = window present in >= 2 DISTINCT docs (dedupe per doc first)
    val shared = posWin.select("doc_id", "win").distinct()
      .groupBy("win").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2).select("win")
    val runs = posWin.join(shared, "win")
      .withColumn("grp", col("pos") -
        row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("run_len"))
    runs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        (max("run_len") + (W - 1)).cast("long").as("max_span_tokens"))
      .orderBy("doc_id")
  }
}
