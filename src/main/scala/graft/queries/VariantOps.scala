package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark 4 VARIANT surface (SURVEY.md §2b): semi-structured event
  * documents shredded with `parse_json` + `variant_get` typed-path
  * extraction — the engine tier above string `get_json_object`
  * (`q_json_extract`): VARIANT parses once into a binary form and
  * every path extraction is a typed traversal, not a re-parse.
  *
  * The "parse once" property is made PHYSICAL here (the Delta/Iceberg
  * variant-shredding idiom): [[writeShredded]] runs the
  * construct→parse→traverse pipeline exactly once per row and lands
  * the TYPED columns in parquet; every downstream read — the
  * registered aggregation, and any future query over the same paths —
  * touches only typed columns (plan-pinned: zero variant expressions
  * in the read path). Without the materialization the per-row
  * construct+parse dominated the measured run (6.8× wall-clock at 10×
  * data — VERDICT r6 #4); the read path is a plain columnar aggregate.
  * Catalyst's projection collapse also replicates the outer
  * `parse_json` into each of the p `variant_get` traversals (3 parse
  * invocations visible in the un-materialized plan), so shredding is
  * what actually bounds parses at one(+1 nested) per row.
  *
  * The operator builds a nested document per event (user block +
  * metrics block + the raw `props` payload embedded as a STRING field,
  * so `variant_get` must traverse into a re-parsed inner object),
  * shreds typed paths back out, and aggregates. The oracle recomputes
  * every extracted value from the BASE COLUMNS — exactness of the
  * whole construct→parse→traverse→cast→write→read round-trip is the
  * contract (any lost precision, wrong path, or null-vs-missing
  * confusion breaks the hash).
  */
object VariantOps {

  /** In-memory shred: one row per event, typed columns out of the
    * variant document. Two parses per row BY DESIGN: the outer
    * document and the embedded raw-props string (nested
    * semi-structure, not a flat schema).
    */
  private[queries] def shredded(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Analytics.loadEvents(spark, sfDir)
    val doc = events.select(
      col("event_type"),
      parse_json(to_json(struct(
        struct(col("user_id").as("id"), pmod(col("user_id"), lit(10)).as("seg")).as("user"),
        struct(col("value").as("v"), col("props").as("raw")).as("metrics")))).as("vdoc"))
    doc.select(
      col("event_type"),
      variant_get(col("vdoc"), "$.user.seg", "bigint").as("seg"),
      variant_get(col("vdoc"), "$.metrics.v", "double").as("v"),
      variant_get(parse_json(variant_get(col("vdoc"), "$.metrics.raw", "string")),
        "$.k", "bigint").as("k"))
  }

  private def shredDir(sfDir: String): String =
    graft.util.TempDirs.forInput(sfDir, "varshred")

  /** Materialize the shredded typed columns (overwrite); returns the
    * path. This is where ALL parsing happens — once per row, however
    * many queries follow.
    */
  def writeShredded(spark: SparkSession, sfDir: String): String = {
    val out = shredDir(sfDir)
    shredded(spark, sfDir).write.mode("overwrite").parquet(out)
    out
  }

  /** The read path: a plain columnar aggregate over the typed shred —
    * no variant machinery anywhere in its plan (spec-pinned).
    */
  def aggShredded(sh: DataFrame): DataFrame =
    sh.groupBy("event_type", "seg")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        Analytics.moneySum(col("v")).as("sum_v"))
      .orderBy("event_type", "seg")

  def qVariantExtract(spark: SparkSession, sfDir: String): DataFrame =
    aggShredded(spark.read.parquet(writeShredded(spark, sfDir)))
}
