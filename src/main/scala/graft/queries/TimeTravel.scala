package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AS-OF snapshot reads over versioned history (SURVEY.md §2b) — the
  * lakehouse time-travel read path: `q_scd2` compresses the change
  * log into validity intervals; this row answers "what did the world
  * look like at instant t" for a set of probe instants by interval
  * containment — the SELECT ... TIMESTAMP AS OF consumer of that
  * history. The oracle is deliberately the OTHER formulation (latest
  * event ≤ t per user via a ranked window over the raw log): two
  * independent definitions of "state at t" must agree, which pins
  * both the history build and the containment read.
  *
  * Scale shape: the history (users × versions, far smaller than the
  * event log) is built once and joined against a 3-row broadcast of
  * probe instants; containment filter + map-side-combined census per
  * (instant, state). The rescan formulation the oracle uses would
  * re-rank the full log PER PROBE — the point of maintaining SCD2
  * history is that as-of reads cost |history|, not |log|·|probes|.
  */
object TimeTravel {

  /** Probe instants (UTC midnights over the 30-day event window). */
  private val Probes = Seq("2024-01-08", "2024-01-15", "2024-01-22")
  private def micros(d: String): Long =
    java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli * 1000L

  def qTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = Timeline.qScd2(spark, sfDir)
      .select(col("user_id"), col("state"), col("valid_from_us"), col("valid_to_us"))
    val probes = spark.createDataFrame(Probes.map(d => (d, micros(d))))
      .toDF("as_of", "t_us")
    hist.join(broadcast(probes),
        col("valid_from_us") <= col("t_us") &&
          (col("valid_to_us").isNull || col("valid_to_us") > col("t_us")))
      .groupBy("as_of", "state")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("as_of", "state")
  }

  /** The independent formulation: latest event ≤ t per user, ranked
    * over the raw log.
    */
  val oracleSql: String = {
    val probeRows = Probes.map(d => s"('$d', ${micros(d)})").mkString(", ")
    s"""WITH p(as_of, t_us) AS (VALUES $probeRows),
       |sel AS (
       |  SELECT p.as_of, e.user_id, e.event_type AS state,
       |    row_number() OVER (PARTITION BY p.as_of, e.user_id
       |                       ORDER BY e.ts DESC, e.event_id DESC) AS rn
       |  FROM events e JOIN p ON epoch_us(e.ts) <= p.t_us
       |)
       |SELECT as_of, state, CAST(count(*) AS BIGINT) AS n_users
       |FROM sel WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
