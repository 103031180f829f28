package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join (SURVEY.md §2b): both sides are intervals —
  * `q_range_join` covers point-in-interval; this is the other interval
  * operator class (overlap predicate `a.s < b.e AND b.s < a.e`,
  * which no equi-join expresses directly). Events become 20-minute
  * activity intervals; the other side is a deterministic lattice of
  * 45-minute windows every 30 minutes (overlapping by construction,
  * so every event can hit 2+ windows and the dedup is load-bearing).
  *
  * The scalable shape is GRID BUCKETING: every interval explodes to
  * the 30-minute grid cells it touches (≤ 2 cells per event interval,
  * 2 per window), candidates equi-join on the cell, the exact overlap
  * predicate filters, and `distinct` collapses pairs that met in two
  * cells. No nested-loop, no cartesian — the join cost is bounded by
  * cell occupancy, which is what survives 100 TB (the oracle's side
  * uses DuckDB's native inequality join instead — two independent
  * algorithms, one answer). The window lattice is built DISTRIBUTED
  * from a one-row bounds aggregate (sequence + explode), no driver
  * collect. All arithmetic is exact integer µs.
  */
object IntervalOverlap {

  private val GridUs = 1800000000L   // 30-min grid = window stride
  private val EventLenUs = 1200000000L // 20-min activity interval
  private val WinLenUs = 2700000000L   // 45-min window
  private val BaseUs = 1704067200000000L

  def qIntervalOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Analytics.loadEvents(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("s"))
      .withColumn("e", col("s") + EventLenUs)

    // window lattice covering the corpus span, built distributed
    val windows = events.agg(max("e").as("emax"))
      .select(explode(sequence(lit(0L),
        expr(s"(emax - ${BaseUs}L) div ${GridUs}L"))).as("k"))
      .select(col("k"), (lit(BaseUs) + col("k") * GridUs).as("ws"))
      .withColumn("we", col("ws") + WinLenUs)

    def gridded(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("cell",
        explode(sequence(expr(s"($s - ${BaseUs}L) div ${GridUs}L"),
          expr(s"($e - 1 - ${BaseUs}L) div ${GridUs}L"))))

    gridded(events, "s", "e").as("a")
      .join(gridded(windows, "ws", "we").as("b"), Seq("cell"))
      .filter(col("a.s") < col("b.we") && col("b.ws") < col("a.e"))
      .select(col("b.k").as("k"), col("a.event_id").as("event_id"))
      .distinct()
      .groupBy("k")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("k")
  }
}
