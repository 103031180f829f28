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

  private def scoredDocs(spark: SparkSession, sfDir: String): DataFrame =
    QualitySvm.plantedQualityDocs(spark, sfDir).select(
      col("doc_id"), col("label"),
      call_function("div",
        regexp_count(col("text"), lit("[0-9]")).cast("long") * lit(10000L),
        greatest(length(col("text")), lit(1)).cast("long")).as("score_bp"))

  /** Gains table over a (decile, label) assignment — shared by the
    * exact ntile and the approx-cut paths, so their parity is a
    * statement about the CUT alone.
    */
  private def gainsCensus(ranked: DataFrame): DataFrame = {
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

  def qDecileLift(spark: SparkSession, sfDir: String): DataFrame =
    gainsCensus(scoredDocs(spark, sfDir).withColumn("decile",
      ntile(10).over(Window.orderBy(desc("score_bp"), col("doc_id")))))

  /** The 100 TB path the exact row's doc points at, made real: the
    * global ntile sort is replaced by CUT POINTS + a broadcast bucket
    * join — no total-order exchange over the corpus anywhere.
    *
    * Exact parity with the ntile table (not a tolerance band), via
    * sketch-then-refine — the classic distributed exact selection:
    *   1. the cut key is the composite `(10000 − score_bp)·2^40 +
    *      doc_id` — the exact path's total order collapsed into one
    *      UNIQUE long, so ranks are unambiguous;
    *   2. `percentile_approx` proposes a candidate value for each of
    *      ntile's own boundary ranks (B_i = i·⌊n/10⌋ + min(i, n%10));
    *   3. ONE batched aggregate computes every candidate's exact rank;
    *   4. each off-by-Δ boundary (Δ ≤ the sketch's rank error, single
    *      digits) is repaired with a TakeOrdered(Δ) over the filtered
    *      scan — per-partition top-Δ + a Δ-row driver merge, never a
    *      sort exchange.
    * Assigning decile = 1 + |{cuts < k}| then reproduces ntile's
    * bucket sizes EXACTLY (spec-pinned census equality at two SFs).
    *
    * Cost shape: ~3 scans + Δ-correction probes of a two-column
    * projection instead of ONE scan + a global range-partitioned sort
    * — the right trade at 100 TB, where rescans parallelize linearly
    * but the total-order exchange is the documented gains-table pinch.
    */
  def qDecileLiftApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = scoredDocs(spark, sfDir)
    val keyed = scored.withColumn("k",
      (lit(10000L) - col("score_bp")) * lit(1L << 40) + col("doc_id"))
      .localCheckpoint() // 3+ scans below — cut lineage, scan the projection
    val n = keyed.count()
    require(n > 0, "q_decile_lift_approx: empty corpus")
    val base = n / 10
    val rem = (n % 10).toInt
    val bounds = (1 to 9).map(i => i * base + math.min(i, rem))
    val probs = bounds.map(b => (b - 0.5) / n)
    // FIXED accuracy, deliberately NOT scaled with n: the sketch only
    // has to land within Δ ≈ n/acc ranks of each boundary — the
    // refine step below restores exactness for ANY Δ — so a constant
    // keeps per-partition summary memory bounded at 100 TB (scaling
    // acc with n would degenerate the sketch into an all-keys
    // single-task merge, the exact failure the operator exists to
    // avoid). At n = 10^10, Δ ≈ 10^5 rows per boundary: the repair's
    // TakeOrdered(Δ) stays a per-partition top-Δ + Δ-row driver merge.
    val acc = 100000
    val candidates = keyed.select(percentile_approx(col("k"),
        array(probs.map(lit(_)): _*), lit(acc)).as("c"))
      .head().getSeq[Long](0)
    // one batched aggregate: every candidate's exact rank
    val rankCols = candidates.zipWithIndex.map { case (v, i) =>
      sum((col("k") <= v).cast("long")).as(s"r$i")
    }
    val ranksRow = keyed.agg(rankCols.head, rankCols.tail: _*).head()
    val cuts = bounds.zip(candidates.zipWithIndex).map { case (b, (v, i)) =>
      val r = ranksRow.getLong(i)
      val delta = b - r
      if (delta == 0) v
      else if (delta > 0)
        // need the delta-th smallest key ABOVE the candidate
        keyed.filter(col("k") > v).orderBy("k").limit(delta.toInt)
          .agg(max("k")).head().getLong(0)
      else
        // candidate overshot by |delta|: the true cut is the
        // (|delta|+1)-th largest key at or below it
        keyed.filter(col("k") <= v).orderBy(col("k").desc).limit(-delta.toInt + 1)
          .agg(min("k")).head().getLong(0)
    }
    val decile = cuts.foldLeft(lit(1)) { (e, v) =>
      e + (col("k") > lit(v)).cast("int")
    }
    gainsCensus(keyed.withColumn("decile", decile))
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
