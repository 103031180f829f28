package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composite end-to-end training-data filter — what a pretraining
  * corpus actually goes through before tokenization: exact dedup →
  * quality gates → language selection. Emitted as a retention FUNNEL
  * (one wide row) so every stage's selectivity is externally verified.
  *
  * Scale shape: ONE scan computes every per-document signal (token
  * count, punctuation/digit ratios, language scores) side by side; the
  * only shuffle is the dedup-keeper aggregation joined back by hash.
  * Running the stages as separate jobs — the naive formulation — would
  * re-scan the corpus four times; at 100 TB the difference is the whole
  * budget. Every signal is a codegen'd `regexp_count`, so the scan
  * projection compiles into one whole-stage-codegen span.
  */
object CorpusFilter {

  /** Funnel counts: total → after exact dedup → after quality gates →
    * retained (dedup + quality + English), plus mean token count of the
    * retained set. Gates: >= 10 tokens, punct_ratio <= 0.2,
    * digit_ratio <= 0.2, language prediction = 'en' (same decision rule
    * as [[TextOps.langId]]).
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")

    // Dedup keepers: one map-side-combined aggregation on the text hash;
    // the join back carries (hash -> keeper id), never the text.
    val keepers = d
      .groupBy(md5(lower(col("text"))).as("h"))
      .agg(min("doc_id").as("keep_id"))

    // every per-document signal is a codegen'd regexp_count — one scan,
    // whole stage compiled (see TextOps for the HOF-vs-regexp_count
    // why); the language decision rule is TextOps's, not a copy.
    val scored = d
      .select(Seq(
        col("doc_id"), md5(lower(col("text"))).as("h"),
        TextOps.wsTokenCount(col("text")).as("n_tokens"),
        round(regexp_count(col("text"), lit(TextOps.PunctClass)).cast("double") /
          greatest(length(col("text")), lit(1)), 4).as("punct_ratio"),
        round(regexp_count(col("text"), lit("[0-9]")).cast("double") /
          greatest(length(col("text")), lit(1)), 4).as("digit_ratio")) ++
        TextOps.langScoreCols(col("text")): _*)

    val pred = TextOps.langPredCol

    scored
      .join(keepers, "h")
      .withColumn("keeper", when(col("doc_id") === col("keep_id"), 1L).otherwise(0L))
      .withColumn("quality",
        when(col("n_tokens") >= 10 && col("punct_ratio") <= 0.2 && col("digit_ratio") <= 0.2, 1L)
          .otherwise(0L))
      .withColumn("is_en", when(pred === "en", 1L).otherwise(0L))
      .agg(
        count(lit(1)).as("n_total"),
        sum(col("keeper")).as("n_after_dedup"),
        sum(col("keeper") * col("quality")).as("n_after_quality"),
        sum(col("keeper") * col("quality") * col("is_en")).as("n_retained"),
        round(avg(when(col("keeper") * col("quality") * col("is_en") === 1L, col("n_tokens"))), 2)
          .as("avg_tokens_retained"))
  }
}
