package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-sequence pattern matching (SURVEY.md §2b) — the CEP /
  * MATCH_RECOGNIZE class: each user's ordered event stream becomes a
  * character string (one char per event type) and behavioral patterns
  * are counted as REGEX matches over that string. Covers the class
  * `q_funnel`/`q_paths` cannot: patterns with quantifiers ("a view,
  * any number of clicks, then a purchase", "a burst of ≥2 consecutive
  * errors") need backtracking-free repetition, not fixed-arity lag/
  * join chains.
  *
  * Cross-engine contract: both engines scan left-to-right and count
  * NON-OVERLAPPING matches (Java `Matcher.find` in Spark, RE2 global
  * match in DuckDB) — identical for the patterns used here, which are
  * deterministic (no alternation requiring backtracking differences).
  * The per-user total order is (ts, event_id) — the q_paths rule,
  * deterministic under timestamp ties.
  *
  * Scale shape: ONE user_id exchange; the per-user string is bounded
  * by that user's activity (the same per-key bound every sessionize /
  * paths operator carries — CEP state is inherently per-key linear).
  * The regex pass is then embarrassingly parallel over |users| rows,
  * each O(len) for these patterns. No self-join, no window re-sort:
  * `array_sort(collect_list(struct))` orders inside the aggregation
  * buffer, so the plan is a single hash aggregate, not Sort+Window.
  */
object SequenceMatch {

  /** Per-user sequence string over the (ts, event_id) total order. */
  private def userSeq(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        // first letters are distinct across the 5 types: s,e,c,v,p
        substring(col("event_type"), 1, 1).as("ch"))
    ev.groupBy("user_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("ts"), col("event_id"), col("ch")))),
          x => x.getField("ch")), "").as("seq"))
  }

  private def runLens(seq: Column): Column =
    transform(regexp_extract_all(seq, lit("e+"), lit(0)), x => length(x))

  def qSequenceMatch(spark: SparkSession, sfDir: String): DataFrame =
    userSeq(spark, sfDir)
      .select(col("user_id"),
        length(col("seq")).cast("long").as("seq_len"),
        regexp_count(col("seq"), lit("vc*p")).cast("long").as("n_browse_buy"),
        regexp_count(col("seq"), lit("e{2,}")).cast("long").as("n_error_burst"),
        coalesce(array_max(runLens(col("seq"))), lit(0)).cast("long").as("max_error_run"))
      .orderBy("user_id")

  val oracleSql: String =
    """WITH seqs AS (
      |  SELECT user_id,
      |    string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY 1
      |)
      |SELECT user_id,
      |  CAST(length(seq) AS BIGINT) AS seq_len,
      |  CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_browse_buy,
      |  CAST(len(regexp_extract_all(seq, 'e{2,}')) AS BIGINT) AS n_error_burst,
      |  CAST(coalesce(list_max(list_transform(regexp_extract_all(seq, 'e+'),
      |    x -> length(x))), 0) AS BIGINT) AS max_error_run
      |FROM seqs ORDER BY user_id""".stripMargin
}
