package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data-feed census (SURVEY.md §2b) — the
  * lakehouse "what changed between table versions" read (Delta CDF /
  * Iceberg changelog): classify every key as added / removed /
  * updated / unchanged between snapshot v1 and v2, with per-class
  * counts, a key-sum content certificate, and the exact money delta
  * the updates moved.
  *
  * v2 is PLANTED from v1 by id residues (the repo's planting
  * discipline, replanted identically in the oracle): residue 3 mod
  * 1000 → price +1.00 (updated), residue 4 → dropped (removed),
  * residue 5 → cloned into a disjoint key space (added) — every class
  * has a known non-empty footprint, and `cents_delta` must equal
  * exactly 100·n_updated.
  *
  * Shape: ONE co-partitioned full outer join on the key — both sides
  * hash-partition once, payload equality is evaluated inline, and the
  * census aggregate has a 4-value domain so map-side combine collapses
  * it before its shuffle (spec pins 3 hash exchanges total,
  * broadcast off). At 100 TB: diffing two snapshots costs exactly one
  * key shuffle of each; for very wide payloads, compare an xxhash64
  * digest column instead of the tuple — same plan. Money moves as
  * exact BIGINT cents (`floor(p·100+½)`, the moneySum rule) so the
  * delta certificate is engine-exact.
  */
object SnapshotDiff {

  private val InsertOffset = 700000000L // disjoint from base order keys

  private def base(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))

  /** The planted v2: updates (residue 3), drops (4), inserts (5). */
  def snapshotV2(spark: SparkSession, sfDir: String): DataFrame = {
    val b = base(spark, sfDir)
    b.filter(col("k") % 1000 =!= 4)
      .withColumn("cents",
        when(col("k") % 1000 === 3, col("cents") + 100).otherwise(col("cents")))
      .unionByName(
        b.filter(col("k") % 1000 === 5)
          .withColumn("k", col("k") + InsertOffset))
  }

  def qSnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val v1 = base(spark, sfDir)
    val v2 = snapshotV2(spark, sfDir)
      .select(col("k").as("k2"), col("ck").as("ck2"), col("st").as("st2"),
        col("pr").as("pr2"), col("cents").as("cents2"))
    val samePayload = col("cents") === col("cents2") && col("ck") === col("ck2") &&
      col("st") === col("st2") && col("pr") === col("pr2")
    v1.join(v2, col("k") === col("k2"), "full_outer")
      .select(
        when(col("k").isNull, lit("added"))
          .when(col("k2").isNull, lit("removed"))
          .when(samePayload, lit("unchanged"))
          .otherwise(lit("updated")).as("change_type"),
        coalesce(col("k"), col("k2")).as("key"),
        when(col("k").isNotNull && col("k2").isNotNull, col("cents2") - col("cents"))
          .otherwise(lit(0L)).as("delta"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"), sum("key").as("key_sum"),
        sum("delta").as("cents_delta"))
      .orderBy("change_type")
  }

  val oracleSql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_custkey AS ck, o_orderstatus AS st,
      |    o_orderpriority AS pr,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders
      |), v2 AS (
      |  SELECT k, ck, st, pr,
      |    CASE WHEN k % 1000 = 3 THEN cents + 100 ELSE cents END AS cents
      |  FROM base WHERE k % 1000 <> 4
      |  UNION ALL
      |  SELECT k + 700000000, ck, st, pr, cents FROM base WHERE k % 1000 = 5
      |), d AS (
      |  SELECT
      |    CASE WHEN a.k IS NULL THEN 'added'
      |         WHEN b.k IS NULL THEN 'removed'
      |         WHEN a.cents = b.cents AND a.ck = b.ck AND a.st = b.st
      |              AND a.pr = b.pr THEN 'unchanged'
      |         ELSE 'updated' END AS change_type,
      |    coalesce(a.k, b.k) AS key,
      |    CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
      |         THEN b.cents - a.cents ELSE 0 END AS delta
      |  FROM base a FULL JOIN v2 b ON a.k = b.k
      |)
      |SELECT change_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(key) AS BIGINT) AS key_sum,
      |  CAST(sum(delta) AS BIGINT) AS cents_delta
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
}
