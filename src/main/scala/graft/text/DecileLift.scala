package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decile lift / gains table (SURVEY.md §2c) — the evaluation a
  * quality FILTER ships with: rank the corpus by the filter's score,
  * cut into 10 equal buckets, and report how much of the known junk
  * each bucket captures. "Decile 1 captures 96% of junk" is the
  * number that justifies a threshold; a filter whose lift curve is
  * flat is noise. Runs over [[QualitySvm.plantedQualityDocs]] (the
  * corpus carries no junk, so ground truth is planted — same corpus,
  * same labels as the trained-filter row).
  *
  * Exactness: the score is the digit ratio in BASIS POINTS —
  * `(10000·digits) div chars`, an exact integer (the q_rfm ntile
  * discipline: ranking ties are broken by doc_id, so the decile cut
  * is a TOTAL order and ntile is deterministic in any engine); all
  * rates are integer basis points via `div`. No doubles anywhere.
  *
  * Scale shape: one codegen scan computes scores; the global rank is
  * ONE total-order sort (ntile over an unpartitioned window — the
  * known single-machine pinch of gains tables; at true 100 TB the
  * same table is computed from approx_percentile cut points, trading
  * exactness, or the q_rfm range-partitioned census); per-decile
  * aggregation is map-side-combined; the cumulative sweep is a
  * 10-row window.
  */
object DecileLift {

  def qDecileLift(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = QualitySvm.plantedQualityDocs(spark, sfDir).select(
      col("doc_id"), col("label"),
      call_function("div",
        regexp_count(col("text"), lit("[0-9]")).cast("long") * lit(10000L),
        greatest(length(col("text")), lit(1)).cast("long")).as("score_bp"))
    val ranked = scored.withColumn("decile",
      ntile(10).over(Window.orderBy(desc("score_bp"), col("doc_id"))))
    val per = ranked.groupBy("decile").agg(
      count(lit(1)).as("n_docs"),
      sum(col("label").cast("long")).as("n_junk"))
    val totalJunk = sum(col("n_junk")).over(Window.orderBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    val cumJunk = sum(col("n_junk")).over(Window.orderBy("decile"))
    per.select(
      col("decile").cast("long").as("decile"),
      col("n_docs"), col("n_junk"),
      call_function("div", col("n_junk") * lit(10000L), col("n_docs")).as("junk_rate_bp"),
      call_function("div", cumJunk * lit(10000L), totalJunk).as("cum_capture_bp"))
      .orderBy("decile")
  }

  /** DuckDB oracle: rebuild the planted corpus in SQL (the
    * corpus_quality_svm plant rule), same total-order ntile, same
    * integer basis-point arithmetic.
    */
  def oracleSql(junkEvery: Int = QualitySvm.JunkEvery,
                plantOffset: Long = QualitySvm.PlantOffset): String =
    s"""WITH planted AS (
       |  SELECT doc_id, text, 0 AS label FROM documents
       |  UNION ALL
       |  SELECT doc_id + $plantOffset,
       |    text || repeat(' 0123456789', CAST(ceil(length(text) / 20.0) AS INT)),
       |    1
       |  FROM documents WHERE doc_id % $junkEvery = 0
       |), scored AS (
       |  SELECT doc_id, label,
       |    (10000 * length(regexp_replace(text, '[^0-9]', '', 'g'))) //
       |      greatest(length(text), 1) AS score_bp
       |  FROM planted
       |), ranked AS (
       |  SELECT label, ntile(10) OVER (ORDER BY score_bp DESC, doc_id) AS decile FROM scored
       |), per AS (
       |  SELECT decile, count(*) AS n_docs, sum(label) AS n_junk FROM ranked GROUP BY 1
       |)
       |SELECT CAST(decile AS BIGINT) AS decile, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_junk AS BIGINT) AS n_junk,
       |  CAST((n_junk * 10000) // n_docs AS BIGINT) AS junk_rate_bp,
       |  CAST((sum(n_junk) OVER (ORDER BY decile) * 10000) //
       |    (sum(n_junk) OVER ()) AS BIGINT) AS cum_capture_bp
       |FROM per ORDER BY decile""".stripMargin
}
