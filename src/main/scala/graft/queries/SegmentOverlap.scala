package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Pairwise audience overlap (SURVEY.md §2b) — the segment-
  * intersection matrix of audience analytics: for every pair of
  * event types, the EXACT number of users doing both, plus Jaccard
  * similarity in integer basis points. The naive formulation
  * self-joins the distinct (type, user) pairs on user — a shuffle of
  * the whole audience ROW SET per pair; this operator instead scans
  * the corpus ONCE into per-type dense bitmaps (the q_bitmap_distinct
  * state — constant-size mergeable bitsets) and intersects k bitmap
  * VALUES pairwise with [[graft.functions.BitmapAndCardExpr]]
  * (word-wise AND + popcount, no intermediate bitmap). All pairwise
  * work happens on k rows, never on the corpus.
  *
  * The pair join is a self-join of the AGGREGATED k-row relation on
  * `type_a < type_b`; both branches canonicalize to the same
  * exchange, so Spark's ReusedExchange runs the corpus aggregation
  * once (spec-pinned) — the plan really is one scan + k² tiny rows.
  *
  * Dense-domain contract as q_bitmap_distinct: ids in [0, maxId)
  * or a loud failure; roaring / re-densified dictionaries are the
  * sparse path.
  */
object SegmentOverlap {

  def qSegmentOverlap(spark: SparkSession, sfDir: String,
                      maxId: Int = 1 << 20): DataFrame = {
    val bm = Analytics.loadEvents(spark, sfDir)
      .groupBy("event_type")
      .agg(GraftFunctions.bitmap_build(col("user_id"), maxId).as("bm"))
      .select(col("event_type"), col("bm"),
        GraftFunctions.bitmap_card(col("bm")).as("n"))

    val a = bm.select(col("event_type").as("type_a"), col("bm").as("bm_a"),
      col("n").as("n_a"))
    val b = bm.select(col("event_type").as("type_b"), col("bm").as("bm_b"),
      col("n").as("n_b"))

    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        GraftFunctions.bitmap_and_card(col("bm_a"), col("bm_b")).as("n_both"))
      .withColumn("jaccard_bp",
        call_function("div", lit(10000L) * col("n_both"),
          col("n_a") + col("n_b") - col("n_both")))
      .orderBy("type_a", "type_b")
  }

  val oracleSql: String =
    """WITH d AS (
      |  SELECT DISTINCT event_type, user_id FROM events
      |), c AS (
      |  SELECT event_type, count(*) AS n FROM d GROUP BY 1
      |), pairs AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS nb
      |  FROM d a JOIN d b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2
      |)
      |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
      |  CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
      |  CAST(coalesce(nb, 0) AS BIGINT) AS n_both,
      |  CAST((10000 * coalesce(nb, 0)) // (ca.n + cb.n - coalesce(nb, 0)) AS BIGINT)
      |    AS jaccard_bp
      |FROM c ca JOIN c cb ON ca.event_type < cb.event_type
      |LEFT JOIN pairs ON ta = ca.event_type AND tb = cb.event_type
      |ORDER BY 1, 2""".stripMargin
}
