package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY.md §2c):
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * All built from `org.apache.spark.sql.functions._` so they stay in
  * whole-stage codegen — these run over every document of a 100 TB
  * corpus, so no UDF boxing on this path.
  */
object TextOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  // ------------------------------------------------------------- tokens

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column =
    size(filter(split(c, "\\s+"), t => length(t) > 0))

  /** BPE-ish token count: runs of letters, runs of digits, and single
    * non-space symbols — a cheap deterministic proxy for subword
    * tokenizer load estimation. Built from `regexp_extract_all` (no
    * lookarounds) so the exact rule is reproducible in any RE2-based
    * external engine, which is what the DuckDB oracle uses.
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+"), lit(0))) +
      size(regexp_extract_all(c, lit("[0-9]+"), lit(0))) +
      size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0)))

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
    val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val stopHits = filter(toks, t => lower(t).isInCollection(stopwords))
    docs(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_actual"),
      size(toks).as("n_tokens"),
      round(size(regexp_extract_all(col("text"), lit(PunctClass), lit(0))).cast("double") /
        greatest(length(col("text")), lit(1)), 4).as("punct_ratio"),
      round(size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0))).cast("double") /
        greatest(length(col("text")), lit(1)), 4).as("digit_ratio"),
      round(size(regexp_extract_all(col("text"), lit("[A-Z]"), lit(0))).cast("double") /
        greatest(length(col("text")), lit(1)), 4).as("upper_ratio"),
      round(size(stopHits).cast("double") / greatest(size(toks), lit(1)), 4).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------- langid

  /** Heuristic language ID via language-marker stopword hits.
    * Deterministic n-gram/stopword scoring — the classic fastText-style
    * signal reduced to a SQL-expressible form. Returns per-(predicted,
    * actual) counts so the oracle can verify the full decision rule.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val markers: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "and", "of", "with"),
      "es" -> Seq("el", "la", "los", "de"),
      "de" -> Seq("der", "die", "und", "das"),
      "fr" -> Seq("le", "la", "les", "des"),
      "zh" -> Seq("的", "了", "是", "在"))
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    def score(lang: String): Column =
      size(filter(toks, t => t.isInCollection(markers(lang)))).as(s"s_$lang")
    val scored = docs(spark, sfDir).select(
      col("doc_id"), col("lang").as("actual"),
      score("en"), score("es"), score("de"), score("fr"), score("zh"))
    // argmax with a fixed priority order on ties (en > es > de > fr > zh):
    // a CASE chain — identical decision rule is trivially expressible in
    // the oracle SQL, so the full classifier is verified end-to-end.
    val langs = Seq("en", "es", "de", "fr", "zh")
    val mx = greatest(langs.map(l => col(s"s_$l")): _*)
    val pred = langs.foldLeft(when(mx === 0, lit("unknown"))) { (acc, l) =>
      acc.when(col(s"s_$l") === mx, lit(l))
    }
    scored
      .withColumn("pred", pred)
      .groupBy(col("pred"), col("actual"))
      .agg(count(lit(1)).as("n"))
      .orderBy("pred", "actual")
  }

  // -------------------------------------------------------- fingerprint

  /** Rolling polynomial hash (Karp-Rabin style) of the normalized text —
    * a deterministic document fingerprint, computed with `aggregate`
    * over the char codes (codegen, no UDF). Mod 1e9+7 keeps every
    * intermediate inside int64 so an external SQL engine can reproduce
    * it without overflow.
    */
  def fingerprint(c: Column): Column = {
    val norm = lower(regexp_replace(c, "\\s+", " "))
    val m = 1000000007L
    aggregate(
      filter(split(norm, ""), ch => length(ch) > 0),
      lit(0L),
      (acc, ch) => (acc * lit(31L) + ascii(ch).cast("long")) % lit(m))
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
