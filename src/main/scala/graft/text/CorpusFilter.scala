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
  * budget. Token arrays are materialized as real columns BEFORE any
  * higher-order function references them (HOF lambdas are
  * CodegenFallback and re-evaluate referenced expression trees per
  * element).
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

    val langs = Seq("en", "es", "de", "fr", "zh")
    val markers: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "and", "of", "with"),
      "es" -> Seq("el", "la", "los", "de"),
      "de" -> Seq("der", "die", "und", "das"),
      "fr" -> Seq("le", "la", "les", "des"),
      "zh" -> Seq("的", "了", "是", "在"))

    val scored = d
      .select(col("doc_id"), col("text"), md5(lower(col("text"))).as("h"))
      // token arrays materialized once, then referenced by the lambdas
      .withColumn("toks", filter(split(col("text"), "\\s+"), t => length(t) > 0))
      .withColumn("ltoks", filter(split(lower(col("text")), "\\s+"), t => length(t) > 0))
      .select(Seq(
        col("doc_id"), col("h"),
        size(col("toks")).as("n_tokens"),
        round(size(regexp_extract_all(col("text"), lit(TextOps.PunctClass), lit(0))).cast("double") /
          greatest(length(col("text")), lit(1)), 4).as("punct_ratio"),
        round(size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0))).cast("double") /
          greatest(length(col("text")), lit(1)), 4).as("digit_ratio")) ++
        langs.map(l =>
          size(filter(col("ltoks"), t => t.isInCollection(markers(l)))).as(s"s_$l")
        ): _*)

    val mx = greatest(langs.map(l => col(s"s_$l")): _*)
    val pred = langs.foldLeft(when(mx === 0, lit("unknown"))) { (acc, l) =>
      acc.when(col(s"s_$l") === mx, lit(l))
    }

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
