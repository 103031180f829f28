package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Within-document repetition detection — the "repeated n-gram" family
  * of quality signals a training-data pipeline uses to drop boilerplate
  * and degenerate generations (the duplicate-line / duplicate-n-gram
  * fractions of published corpus-quality recipes).
  *
  * Signals per document, from the word-3-gram MULTISET (unlike the
  * dedup shingle sets, multiplicity is the point here):
  *   - repeated-gram fraction: 1 − distinct/total
  *   - top-gram share: max gram count / total
  * rolled up per language with EXACT integer numerators/denominators
  * (the per-doc repetitive flag is pure integer arithmetic,
  * `(total − distinct)·5 > total` ⇔ ratio > 0.2, so no float compare
  * can drift between engines).
  *
  * Scale shape: explode → two map-side-combined groupBys
  * (doc,gram → doc → lang). Gram rows shuffle once with partial
  * aggregation; nothing is per-driver, nothing is quadratic. The
  * correctness contract plants degenerate docs (a 10-token prefix
  * repeated 5×) at `doc_id + 4·PlantOffset` — pure column arithmetic
  * the oracle rebuilds — which MUST land in `n_docs_repetitive`.
  */
object Repetition {

  /** Word n-grams WITH multiplicity (contrast
    * [[Dedup.shinglesFromTokens]], which is the distinct set): the
    * same bounded-sequence transform minus the `array_distinct`.
    * `toks` must be a materialized column (HOF lambdas re-evaluate
    * referenced expressions per element).
    */
  def ngramMultiset(toks: Column, n: Int): Column =
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(size(toks) >= n, concat_ws(" ", slice(toks, i + 1, lit(n))))),
      s => s.isNotNull && length(s) > 0)

  /** Corpus + one degenerate doc per eligible 10th document: the first
    * 10 tokens repeated 5×, planted at `doc_id + 4·PlantOffset` with
    * the base doc's language. Repetition ratio of the plant is ≈ 0.75
    * (48 grams, ≈ 12 distinct), far above the 0.2 flag line.
    */
  def plantedRepetitionDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.dedup.NearDup.guardIds(d, "doc_id")
    val prefix = concat_ws(" ", slice(Dedup.tokens(col("text")), 1, 10))
    d.select(col("doc_id"), col("lang"), lower(col("text")).as("text"))
      .unionByName(
        d.filter(col("doc_id") % 10 === 0 &&
            regexp_count(col("text"), lit("\\S+")) >= 10)
          .select((col("doc_id") + 4 * Dedup.PlantOffset).as("doc_id"), col("lang"),
            concat_ws(" ", array_repeat(prefix, 5)).as("text")))
  }

  /** Per-language repetition rollup over the planted corpus. */
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = plantedRepetitionDocs(spark, sfDir)
      .select(col("doc_id"), col("lang"), Dedup.tokens(col("text")).as("toks"))
    val grams = toks.select(col("doc_id"), col("lang"),
      explode(ngramMultiset(col("toks"), 3)).as("gram"))
    val perDoc = grams.groupBy("doc_id", "lang", "gram").count()
      .groupBy("doc_id", "lang")
      .agg(sum("count").as("total"), count(lit(1)).as("dist"), max("count").as("maxc"))
    perDoc.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("total").as("total_grams"),
        sum("dist").as("distinct_grams"),
        sum(when((col("total") - col("dist")) * 5 > col("total"), 1L).otherwise(0L))
          .as("n_docs_repetitive"),
        max(col("maxc").cast("double") / col("total")).as("raw_top_share"))
      .select(col("lang"), col("n_docs"), col("total_grams"), col("distinct_grams"),
        (floor((lit(1.0) - col("distinct_grams").cast("double") / col("total_grams")) * 10000 + 0.5) / 10000)
          .as("rep_ratio"),
        col("n_docs_repetitive"),
        (floor(col("raw_top_share") * 10000 + 0.5) / 10000).as("max_top_share"))
      .orderBy("lang")
  }
}
