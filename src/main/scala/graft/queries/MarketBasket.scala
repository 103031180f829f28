package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence (SURVEY.md §2b) — the
  * recommendation/affinity primitive: which brand PAIRS appear in the
  * same order, how often, against each brand's own order reach. The
  * canonical shape behind "customers who bought X also bought Y",
  * co-click matrices, and item-item collaborative filtering's
  * neighborhood step.
  *
  * Scale shape: the pair explosion is the whole problem — a naive
  * per-basket cross product is Σ items² and a basket with 10⁶ items
  * (a bot, a catalog crawl) detonates it. Here (1) baskets reduce to
  * DISTINCT (order, brand) first (map-side-combined distinct — dedups
  * multi-lineitem brands before any pairing), (2) the self-join runs
  * CO-PARTITIONED on the basket key (both sides shuffle once on
  * l_orderkey, pairs never leave the partition), and (3) the `<`
  * predicate halves the matrix and canonicalizes the pair before the
  * (b1, b2) count aggregate. Per-basket cost is C(distinct brands, 2)
  * ≤ C(25, 2) here; in an unbounded catalog the distinct step is where
  * a basket cap (drop baskets > N items, loudly) would slot in.
  * Brand order-reach counts ride the same reduced (order, brand) rows,
  * and the two reach lookups broadcast (|brands| rows). Top-20 by
  * support is a TakeOrdered, never a full sort.
  *
  * All-integer output (support + reaches) — hash-exact in any engine.
  */
object MarketBasket {

  def qMarketBasket(spark: SparkSession, sfDir: String): DataFrame = {
    val ob = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .join(spark.read.parquet(s"$sfDir/part.parquet")
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("ok"), col("p_brand").as("brand"))
      .distinct()
      .localCheckpoint() // feeds the self-join twice + the reach counts
    val reach = ob.groupBy("brand").agg(count(lit(1)).as("n_orders"))
    val pairs = ob.as("a")
      .join(ob.as("b"),
        col("a.ok") === col("b.ok") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("b1"), col("b.brand").as("b2"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(reach.withColumnsRenamed(Map("brand" -> "b1", "n_orders" -> "n_b1"))), "b1")
      .join(broadcast(reach.withColumnsRenamed(Map("brand" -> "b2", "n_orders" -> "n_b2"))), "b2")
      .select("b1", "b2", "n_both", "n_b1", "n_b2")
      .orderBy(desc("n_both"), col("b1"), col("b2"))
      .limit(20)
  }
}
