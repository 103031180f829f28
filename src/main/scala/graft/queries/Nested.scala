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

  /** Ordered string aggregation (LISTAGG / STRING_AGG): per customer,
    * the comma-joined ascending list of order keys — the export shape
    * for feeding id lists to downstream systems. `collect_list` is a
    * partial (ObjectHashAggregate) aggregate, so lists combine
    * map-side; the deterministic part is `array_sort` AFTER collection
    * (collect order is partition-dependent, sorted order is not), and
    * the join to one string is pure codegen.
    */
  def qListagg(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        // sort NUMERICALLY, then stringify — sorting the strings would
        // put "10" before "9" and diverge from ORDER BY o_orderkey
        array_join(transform(array_sort(collect_list(col("o_orderkey"))),
          x => x.cast("string")), ",").as("order_keys"))
      .orderBy("o_custkey")
  }

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
