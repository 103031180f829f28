package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark 4 VARIANT surface (SURVEY.md §2b): semi-structured event
  * documents shredded with `parse_json` + `variant_get` typed-path
  * extraction — the engine tier above string `get_json_object`
  * (`q_json_extract`): VARIANT parses once into a binary form and
  * every path extraction is a typed traversal, not a re-parse, which
  * is the difference between one scan and p scans when p paths are
  * pulled from the same document at 100 TB.
  *
  * The operator builds a nested document per event (user block +
  * metrics block + the raw `props` payload embedded as a STRING field,
  * so `variant_get` must traverse into a re-parsed inner object),
  * shreds typed paths back out, and aggregates. The oracle recomputes
  * every extracted value from the BASE COLUMNS — exactness of the
  * whole construct→parse→traverse→cast round-trip is the contract
  * (any lost precision, wrong path, or null-vs-missing confusion
  * breaks the hash).
  */
object VariantOps {

  def qVariantExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Analytics.loadEvents(spark, sfDir)
    val doc = events.select(
      col("event_type"),
      parse_json(to_json(struct(
        struct(col("user_id").as("id"), pmod(col("user_id"), lit(10)).as("seg")).as("user"),
        struct(col("value").as("v"), col("props").as("raw")).as("metrics")))).as("vdoc"))
    val shredded = doc.select(
      col("event_type"),
      variant_get(col("vdoc"), "$.user.seg", "bigint").as("seg"),
      variant_get(col("vdoc"), "$.metrics.v", "double").as("v"),
      // the inner payload round-trips as a STRING field; k comes out of
      // a second parse — nested semi-structure, not a flat schema
      variant_get(parse_json(variant_get(col("vdoc"), "$.metrics.raw", "string")),
        "$.k", "bigint").as("k"))
    // moneySum, not round(sum(double)): a double sum's last cents
    // depend on partition/merge order (the sf1 one-cent lesson).
    shredded
      .groupBy("event_type", "seg")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        Analytics.moneySum(col("v")).as("sum_v"))
      .orderBy("event_type", "seg")
  }
}
