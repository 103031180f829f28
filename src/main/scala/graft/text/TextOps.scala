package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY.md §2c):
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * These run over every document of a 100 TB corpus, so the hot path is
  * kept inside WHOLE-STAGE CODEGEN (asserted by PlanAuditSpec): token
  * and marker counting are `regexp_count` expressions, never
  * higher-order-function lambdas (HOFs are CodegenFallback — they
  * interpret per array element), and [[fingerprint]]'s order-dependent
  * rolling hash — which has no `functions._` codegen form — is the
  * custom codegen Expression [[graft.functions.RollingHashExpr]].
  */
object TextOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  // ------------------------------------------------------------- tokens

  /** Whitespace token count: a token is a maximal `\S+` run, so the
    * count is one codegen'd `regexp_count` — the equivalent
    * `size(filter(split(...)))` formulation is a CodegenFallback
    * HigherOrderFunction that interprets per element, which is the
    * wrong shape for a every-document-of-the-corpus scan.
    */
  def wsTokenCount(c: Column): Column = regexp_count(c, lit("\\S+"))

  /** Count of whitespace tokens whose lowercase form is in `words`,
    * as ONE codegen'd regexp_count over the lowercased text: zero-width
    * boundaries pin complete tokens, so the count is exactly
    * `size(filter(tokens, lower(_) in words))` without the lambda.
    */
  def tokenSetCount(c: Column, words: Seq[String]): Column =
    regexp_count(lower(c),
      lit("(?:(?<=\\s)|^)(?:" + words.mkString("|") + ")(?=\\s|$)"))

  /** BPE-ish token count: runs of letters, runs of digits, and single
    * non-space symbols — a cheap deterministic proxy for subword
    * tokenizer load estimation. No lookarounds, so the exact rule is
    * reproducible in any RE2-based external engine, which is what the
    * DuckDB oracle uses.
    *
    * ONE alternation scan, not three separate regexp_counts: the three
    * classes are disjoint, so the greedy left-to-right alternation
    * matches exactly the union of the per-class matches (equality
    * verified corpus-wide against the three-scan form, whose sum the
    * oracle SQL still computes) at a third of the regex passes — this
    * expression sits under every tokenization-bound operator
    * (text_tokens, text_token_budget, corpus_seqpack ±manifest).
    */
  def bpeishTokenCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Per-document token statistics. */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      wsTokenCount(col("text")).as("ws_tokens"),
      bpeishTokenCount(col("text")).as("bpeish_tokens"),
      length(col("text")).as("n_chars_actual"))
      .orderBy("doc_id")

  // ------------------------------------------------------------ quality

  /** Quality-scoring signals: length, mean word length, punctuation /
    * digit / uppercase / whitespace ratios, stopword ratio.
    */
  /** ASCII punctuation, spelled out as an explicit class so the Java and
    * RE2 (oracle) regex engines agree character-for-character.
    */
  val PunctClass: String = """[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""

  def qualityScores(spark: SparkSession, sfDir: String): DataFrame = {
    val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")
    // every signal is a codegen'd regexp_count / length — one interpreted
    // lambda in this projection would drop the whole stage out of codegen
    docs(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_actual"),
      wsTokenCount(col("text")).as("n_tokens"),
      round(regexp_count(col("text"), lit(PunctClass)).cast("double") /
        greatest(length(col("text")), lit(1)), 4).as("punct_ratio"),
      round(regexp_count(col("text"), lit("[0-9]")).cast("double") /
        greatest(length(col("text")), lit(1)), 4).as("digit_ratio"),
      round(regexp_count(col("text"), lit("[A-Z]")).cast("double") /
        greatest(length(col("text")), lit(1)), 4).as("upper_ratio"),
      round(tokenSetCount(col("text"), stopwords).cast("double") /
        greatest(wsTokenCount(col("text")), lit(1)), 4).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------- langid

  /** Language-marker token sets and priority order — the single source
    * of the decision rule shared by [[langId]], the corpus filter, and
    * (hand-mirrored) the SQL oracles.
    */
  val Langs: Seq[String] = Seq("en", "es", "de", "fr", "zh")
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "with"),
    "es" -> Seq("el", "la", "los", "de"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "les", "des"),
    "zh" -> Seq("的", "了", "是", "在"))

  /** Per-language marker-hit scores over `text`, named s_<lang>. */
  def langScoreCols(text: Column): Seq[Column] =
    Langs.map(l => tokenSetCount(text, LangMarkers(l)).as(s"s_$l"))

  /** Arg-max prediction over the s_<lang> columns with a fixed priority
    * order on ties (en > es > de > fr > zh); all-zero scores →
    * 'unknown'. A CASE chain, so the identical decision rule is
    * trivially expressible in the oracle SQL.
    */
  def langPredCol: Column = {
    val mx = greatest(Langs.map(l => col(s"s_$l")): _*)
    Langs.foldLeft(when(mx === 0, lit("unknown"))) { (acc, l) =>
      acc.when(col(s"s_$l") === mx, lit(l))
    }
  }

  /** Heuristic language ID via language-marker stopword hits.
    * Deterministic n-gram/stopword scoring — the classic fastText-style
    * signal reduced to a SQL-expressible form. Returns per-(predicted,
    * actual) counts so the oracle can verify the full decision rule.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = docs(spark, sfDir).select(
      col("doc_id") +: col("lang").as("actual") +: langScoreCols(col("text")): _*)
    scored
      .withColumn("pred", langPredCol)
      .groupBy(col("pred"), col("actual"))
      .agg(count(lit(1)).as("n"))
      .orderBy("pred", "actual")
  }

  // ------------------------------------------------------- token budget

  /** Corpus token-budget summary — the first number every pretraining
    * run needs: total/mean/percentile token counts (whitespace and
    * BPE-ish) plus character volume, in ONE map-side-combined
    * aggregation over a single scan.
    */
  def tokenBudget(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(
        wsTokenCount(col("text")).as("t"),
        bpeishTokenCount(col("text")).as("b"),
        length(col("text")).as("c"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("t").cast("long")).as("total_ws_tokens"),
        sum(col("b").cast("long")).as("total_bpeish_tokens"),
        sum(col("c").cast("long")).as("total_chars"),
        round(avg("t"), 2).as("avg_ws_tokens"),
        round(expr("percentile(t, 0.5)"), 1).as("p50_ws_tokens"),
        round(expr("percentile(t, 0.9)"), 1).as("p90_ws_tokens"))

  // ------------------------------------------------------ n-gram counts

  /** Corpus-level top-k word-n-gram frequencies — the contamination /
    * boilerplate analysis pass (which exact phrases dominate the
    * corpus). Occurrences are counted WITH multiplicity (repeats inside
    * one doc count), unlike the dedup shingle sets.
    *
    * Scale shape: explode → one map-side-combined groupBy (the shuffle
    * carries one row per distinct gram per partition) → TakeOrdered for
    * the global top-k (k rows per partition reach the driver, never the
    * gram table).
    */
  def ngramCounts(spark: SparkSession, sfDir: String,
                  n: Int = 2, k: Int = 20): DataFrame = {
    val d = docs(spark, sfDir)
      .select(split(lower(col("text")), "\\s+").as("raw"))
      .select(filter(col("raw"), t => length(t) > 0).as("toks"))
    d.select(explode(
        filter(
          transform(sequence(lit(0), greatest(size(col("toks")) - n, lit(0))),
            i => when(size(col("toks")) >= n, concat_ws(" ", slice(col("toks"), i + 1, lit(n))))),
          g => g.isNotNull)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("gram"))
      .limit(k)
  }

  // -------------------------------------------------------- fingerprint

  /** Rolling polynomial hash (Karp-Rabin style) of the normalized text —
    * a deterministic document fingerprint. The order-dependent fold is a
    * custom codegen Expression ([[graft.functions.RollingHashExpr]]) —
    * the earlier `aggregate` HOF formulation was CodegenFallback,
    * boxing one single-char string per character of the corpus. Mod
    * 1e9+7 keeps every intermediate inside int64 so an external SQL
    * engine can reproduce it without overflow.
    */
  def fingerprint(c: Column): Column = {
    val norm = lower(regexp_replace(c, "\\s+", " "))
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.RollingHashExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(norm)))
  }

  def fingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    docs(spark, sfDir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp_roll"),
      substring(md5(norm), 1, 16).as("fp_md5"))
      .orderBy("doc_id")
  }
}
