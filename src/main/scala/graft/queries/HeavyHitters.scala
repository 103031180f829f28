package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Exact heavy hitters via a two-pass Misra–Gries sketch
  * (SURVEY.md §2b).
  *
  * The naive formulation — groupBy(key).count().filter(cnt > n/8) —
  * shuffles EVERY distinct key; at 100 TB that is a
  * terabyte-of-distinct-keys exchange to find a handful of rows. The
  * sketch pass replaces it with a constant ~k·16-byte buffer per
  * partition (one aggregate row total through the shuffle), whose MG
  * guarantee makes the candidate set a SUPERSET of the true heavy
  * hitters; the recount pass then touches only candidate keys
  * (a k-element IN filter the scan can evaluate inline), so the final
  * answer is exact — which is why the oracle can be the plain
  * GROUP BY ... HAVING.
  *
  * The probed key is a deterministic Zipf-like plant,
  * `length(bin(event_id % 65536 + 1))` — geometric frequencies
  * (~50%/25%/12.5%…) at EVERY scale factor, so the heavy-hitter set
  * is scale-free where the natural user_id distribution flattens as
  * the corpus grows.
  */
object HeavyHitters {

  val K = 8

  private def keyed(spark: SparkSession, sfDir: String): DataFrame =
    Analytics.loadEvents(spark, sfDir)
      .select(length(bin((col("event_id") % 65536L) + 1L)).cast("long").as("hk"))

  def qHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = keyed(spark, sfDir)
    // Pass 1: one aggregate row — candidates plus the exact total.
    val row = ev.agg(
      GraftFunctions.mg_topk(col("hk"), K).as("cands"),
      count(lit(1)).as("n")).collect()(0)
    val cands = row.getSeq[Long](0)
    val n = row.getLong(1)
    // Pass 2: exact recount of candidates only; strict integer
    // threshold cnt * K > n (no division, no floats).
    ev.filter(col("hk").isin(cands: _*))
      .groupBy("hk")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * K > n)
      .orderBy("hk")
  }
}
