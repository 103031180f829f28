package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nested/complex-type round trip (SURVEY.md §2b): denormalize
  * lineitems into one struct-array per order (the
  * "training-example-per-row" packing every LLM data pipeline ships
  * to its loader), then compute over the packed array and prove the
  * packing lossless against the flat aggregate — the oracle is the
  * plain two-level GROUP BY that never builds the array.
  *
  * `sort_array` orders the structs lexicographically across ALL
  * fields (linenumber first; ties fall through to quantity/price, and
  * full-duplicate structs are order-indifferent), making the packed
  * layout byte-deterministic. The array fold runs via `aggregate` — a
  * higher-order function, interpreted (CodegenFallback) in Spark, but
  * evaluated once per ORDER over an in-memory array, not once per
  * lineitem scan row; the scan/groupBy below it stays codegen.
  */
object Nested {

  def qNested(spark: SparkSession, sfDir: String): DataFrame = {
    val packed = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(struct(
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))).as("items"))
      .select(col("l_orderkey"), col("items"),
        size(col("items")).as("n_items"),
        aggregate(col("items"), lit(0.0d),
          (acc, x) => acc + x.getField("l_quantity")).as("qty_sum"))
    packed
      .groupBy("n_items")
      .agg(count(lit(1)).as("n_orders"),
        // quantities are integer-valued doubles; the sums are exact
        sum("qty_sum").cast("long").as("total_qty"))
      .orderBy("n_items")
  }
}
