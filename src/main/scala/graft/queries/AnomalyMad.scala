package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust anomaly detection (SURVEY.md §2b) — median / MAD outlier
  * flagging in exact integers: per event type, the lower median of
  * the value (in cents), the median absolute deviation, and the
  * count of events beyond 3·MAD. Mean/stddev anomaly gates break
  * under the very outliers they hunt (one 10⁶× value drags the mean
  * past everything); the median/MAD pair has a 50% breakdown point —
  * the robust-statistics standard.
  *
  * EXACT MEDIANS WITHOUT A GLOBAL SORT: per-group exact order
  * statistics normally need a total order per group — a sort whose
  * parallelism is capped by |groups| (here 5 — a scale killer). The
  * engine instead uses the FREQUENCY-TABLE formulation over the
  * bounded cents domain: one map-side-combined histogram
  * (corpus → |types|·|domain| rows), then running-cumulative windows
  * over the HISTOGRAM — domain-bounded, never corpus-bounded. The
  * lower median (rank ⌊(n+1)/2⌋) is the bucket where the cumsum
  * first covers the rank; the deviation histogram REGROUPS the same
  * counts around the median (med−d and med+d fold together) with no
  * second corpus scan. Every step integral — ties, even counts, and
  * rank arithmetic identical cross-engine by construction.
  *
  * The oracle is the NAIVE row-level order-statistic formulation
  * (row_number over raw values) — an independent derivation that
  * must agree bucket-for-bucket with the histogram route.
  */
object AnomalyMad {

  def qAnomalyMad(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = Analytics.loadEvents(spark, sfDir)
      .select(col("event_type"), floor(col("value") * 100 + 0.5).cast("long").as("vc"))
      .groupBy("event_type", "vc").agg(count(lit(1)).as("c"))

    def lowerMedian(h: DataFrame, valueCol: String, outCol: String): DataFrame = {
      val byType = Window.partitionBy("event_type")
      val cumW = byType.orderBy(valueCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.withColumn("n", sum("c").over(byType))
        .withColumn("cum", sum("c").over(cumW))
        .withColumn("r", expr("(n + 1) div 2"))
        .filter(col("cum") >= col("r") && col("cum") - col("c") < col("r"))
        .select(col("event_type"), col(valueCol).as(outCol), col("n"))
    }

    val med = lowerMedian(hist, "vc", "med_cents")
    val devHist = hist.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("vc") - col("med_cents")).as("dev"), col("c"))
      .groupBy("event_type", "dev").agg(sum("c").as("c"))
    val mad = lowerMedian(devHist, "dev", "mad_cents")

    val outliers = devHist.join(broadcast(mad.select("event_type", "mad_cents")), "event_type")
      .groupBy("event_type")
      .agg(sum(when(col("dev") > lit(3) * col("mad_cents"), col("c")).otherwise(0L))
        .as("n_outliers"))

    med.join(mad.select("event_type", "mad_cents"), "event_type")
      .join(outliers, "event_type")
      .select(col("event_type"), col("n").as("n_events"), col("med_cents"),
        col("mad_cents"), col("n_outliers"))
      .orderBy("event_type")
  }

  val oracleSql: String =
    """WITH v AS (
      |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events
      |), r AS (
      |  SELECT event_type, vc,
      |    row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM v
      |), m AS (
      |  SELECT event_type, vc AS med, n FROM r WHERE rn = (n + 1) // 2
      |), d AS (
      |  SELECT v.event_type, abs(vc - med) AS dev
      |  FROM v JOIN m ON v.event_type = m.event_type
      |), r2 AS (
      |  SELECT event_type, dev,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM d
      |), mad AS (
      |  SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2
      |)
      |SELECT m.event_type, CAST(m.n AS BIGINT) AS n_events,
      |  CAST(m.med AS BIGINT) AS med_cents, CAST(mad.mad AS BIGINT) AS mad_cents,
      |  CAST((SELECT count(*) FROM d
      |        WHERE d.event_type = m.event_type AND d.dev > 3 * mad.mad) AS BIGINT)
      |    AS n_outliers
      |FROM m JOIN mad ON m.event_type = mad.event_type
      |ORDER BY 1""".stripMargin
}
