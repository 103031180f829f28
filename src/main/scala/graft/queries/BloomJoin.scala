package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{BloomSketch, GraftFunctions}

/** Runtime bloom-filter semi-join reduction (SURVEY.md §2b).
  *
  * The 100 TB shape this demonstrates: a fact table (lineitem) joined
  * to a SELECTIVE subset of a dimension that is itself too large to
  * broadcast as rows. Shipping every fact row into the join shuffle
  * only to drop 80% of them on the other side is the classic wasted
  * exchange; the fix is a runtime filter — build a ~kilobytes bloom
  * bitmap over the dim's surviving join keys (distributed OR-merge,
  * `BloomSketch.build`), then drop non-matching fact rows BEFORE the
  * shuffle with a codegen membership probe. False positives (~1%)
  * still flow into the exact join and are eliminated there, so the
  * bloom is semantically invisible — the oracle is the PLAIN join.
  *
  * Spark's AQE can inject the same filter itself when statistics
  * reveal the opportunity
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator
  * is the explicit, statistics-independent form — the join is hinted
  * `merge` to model the dim-too-big-to-broadcast regime even at test
  * scale.
  */
object BloomJoin {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def qBloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = t(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))

    // Two actions at plan time, same discipline as the
    // literal-centroid ANN pipelines: count sizes the bitmap, the
    // treeAggregate builds it. Both touch only the filtered key
    // column (~1/5 of orders), never the fact table.
    val nKeys = urgent.count()
    val bits = BloomSketch.build(urgent.as(Encoders.LONG), nKeys)

    val facts = t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      .filter(GraftFunctions.bloom_might_contain(bits, col("l_orderkey")))

    facts
      .join(urgent.hint("merge"), facts("l_orderkey") === urgent("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        Analytics.moneyRevenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("l_returnflag")
  }
}
