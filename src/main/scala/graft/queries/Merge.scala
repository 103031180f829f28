package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge / upsert (SURVEY.md §2b): reconcile a base snapshot with
  * a change batch containing updates, tombstone deletes, and inserts —
  * latest version wins, tombstones drop the key. The Delta/Iceberg
  * MERGE INTO shape expressed relationally: union the versioned
  * sources, keep the max-version row per key, filter tombstones.
  *
  * The change batch is PLANTED from id residues (the repo's planting
  * discipline, replanted identically in the oracle): residue 3 →
  * price-updated twin, residue 4 → tombstone, residue 5 → insert in
  * a disjoint key space, so every merge action has a known non-empty
  * footprint.
  *
  * Shape: union is scan-concatenation (no shuffle); the only exchange
  * is the per-key window, and the `row_number() = 1` cut runs as
  * WindowGroupLimit (per-partition top-1, no full sort spill) — at
  * 100 TB this is one shuffle of (key, payload) and nothing else.
  * `row_number` over (version DESC, is_delete DESC) is total because
  * a key appears at most once per version.
  */
object Merge {

  private val InsertOffset = 600000000L // disjoint from base order keys

  private def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice")

  /** Planted change batch: updates (residue 3), tombstones (4),
    * inserts (5, disjoint key space).
    */
  def changeBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val o = orders(spark, sfDir)
    val upd = o.filter(col("o_orderkey") % 1000 === 3)
      .select(col("o_orderkey"), (col("o_totalprice") + 1000).as("o_totalprice"),
        lit(1L).as("version"), lit(false).as("is_delete"))
    val del = o.filter(col("o_orderkey") % 1000 === 4)
      .select(col("o_orderkey"), col("o_totalprice"),
        lit(1L).as("version"), lit(true).as("is_delete"))
    val ins = o.filter(col("o_orderkey") % 1000 === 5)
      .select((col("o_orderkey") + InsertOffset).as("o_orderkey"), col("o_totalprice"),
        lit(1L).as("version"), lit(false).as("is_delete"))
    upd.unionByName(del).unionByName(ins)
  }

  def qMergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"),
        lit(0L).as("version"), lit(false).as("is_delete"))
    val w = Window.partitionBy("o_orderkey").orderBy(col("version").desc)
    base.unionByName(changeBatch(spark, sfDir))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && !col("is_delete"))
      .select("o_orderkey", "o_totalprice", "version")
      .orderBy("o_orderkey")
  }
}
