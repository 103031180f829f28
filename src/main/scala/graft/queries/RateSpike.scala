package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window rate-spike detection (SURVEY.md §2b) — the
  * monitoring/alerting shape: an hour is a spike when its event count
  * exceeds 3× the trailing-24h mean. The comparison is the exact
  * integer cross-multiplication `n·24 > 3·Σ(trailing 24)` — no
  * stddev, whose Welford-vs-naive accumulation differs across engines
  * in the last ulp, and no division at all; the flag is bit-exact by
  * construction.
  *
  * Natural traffic is too flat to exercise the contract, so bursts
  * are PLANTED: hours with `h ≡ 13 (mod 97)` get every event
  * duplicated ×9 (id-derived, replanted identically in the oracle) —
  * those hours must flag, their neighbors must not, and the first 24
  * hours are excluded (no full trailing window, no partial-window
  * false positives).
  *
  * Shape: one map-side-combined (hour) count, one RANGE-frame window
  * over the hour index — the hourly series is |hours| rows at any
  * corpus size, so everything after the first aggregate is
  * cardinality-trivial at 100 TB.
  */
object RateSpike {

  private val HourUs = 3600000000L
  private val BaseUs = 1704067200000000L

  /** Events ∪ 9 extra copies of every event in hours ≡ 13 (mod 97). */
  def plantedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Analytics.loadEvents(spark, sfDir)
      .select(expr(s"(unix_micros(ts) - ${BaseUs}L) div ${HourUs}L").as("h"))
    e.unionByName(
      e.filter(col("h") % 97 === 13)
        .select(col("h"), explode(sequence(lit(1), lit(9))).as("copy"))
        .select("h"))
  }

  def qRateSpike(spark: SparkSession, sfDir: String): DataFrame =
    trailingSweep(
      plantedEvents(spark, sfDir).groupBy("h").agg(count(lit(1)).as("n")),
      "q_rate_spike")

  /** Trailing-24h sweep over an ALREADY-AGGREGATED (h, n) hourly
    * series — shared with the streaming twin. The global-order window
    * here is single-partition by design and bounded BY CONSTRUCTION:
    * its input is one row per hour, so cardinality scales with the
    * TIME SPAN (a decade < 90k rows), never with corpus size — the
    * RateSpikeSpec pins both the plan shape (window fed by the
    * aggregate, not raw events) and the measured sub-linear input
    * cardinality across SFs. If a series ever outgrew one partition,
    * the reshape is day-bucketed windows with a 24-row boundary
    * overlap; at any realistic span the single sorted partition of a
    * few-thousand-row series is the cheaper plan.
    */
  private[graft] def trailingSweep(hourly: DataFrame, tag: String): DataFrame = {
    val trailing = Window.orderBy("h").rangeBetween(-24, -1)
    val hminRow = hourly.agg(min("h")).head()
    require(!hminRow.isNullAt(0),
      s"$tag: empty events — no hourly series to scan")
    val hmin = hminRow.getLong(0)
    hourly
      .withColumn("trail", sum("n").over(trailing))
      .filter(col("h") >= hmin + 24)
      .withColumn("is_spike", col("n") * 24 > col("trail") * 3)
      .select("h", "n", "trail", "is_spike")
      .orderBy("h")
  }
}
