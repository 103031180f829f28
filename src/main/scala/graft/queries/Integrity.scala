package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality / integrity validation pass (SURVEY.md §2b): the
  * contract checks an ingest pipeline runs before promoting a drop —
  * referential integrity (orphan facts, orphan orders), key
  * uniqueness, null and range violations — emitted as one labeled
  * (check_name, n) report.
  *
  * The base tables are CLEAN, so the drop under validation is the
  * corpus PLUS a deterministic id-derived slice of planted
  * violations (the repo's planting discipline): every 1000th order
  * key spawns a corrupt twin (orphaned custkey, negated price, null
  * date), the next residue spawns exact duplicates, and a lineitem
  * residue spawns orphaned/negated/out-of-range fact rows. The
  * oracle replants identically in SQL, so every check has a KNOWN
  * nonzero count — an all-zero report would prove nothing about the
  * checks themselves.
  *
  * Shapes: orphans are left-anti joins carrying ids only; duplicate
  * keys are a map-side-combined count-per-key; null/range checks
  * ride ONE shared scan per table as conditional aggregates. The
  * report reduces to 7 rows at any scale.
  */
object Integrity {

  private val OrderKeyOffset = 800000000L // planted order twins' key space
  private val CustKeyOffset = 900000000L  // guaranteed outside customer keys
  private val LineKeyOffset = 700000000L  // planted fact orphans' key space

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Orders ∪ corrupt twins (o_orderkey % 1000 = 0) ∪ exact
    * duplicates (o_orderkey % 1000 = 1).
    */
  def plantedOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val corrupt = orders.filter(col("o_orderkey") % 1000 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + OrderKeyOffset)
      .withColumn("o_custkey", col("o_custkey") + CustKeyOffset)
      .withColumn("o_totalprice", -col("o_totalprice"))
      .withColumn("o_orderdate", lit(null).cast("timestamp"))
    val dups = orders.filter(col("o_orderkey") % 1000 === 1)
    orders.unionByName(corrupt).unionByName(dups)
  }

  /** Lineitem ∪ orphaned/negated/out-of-range rows (l_orderkey %
    * 1000 = 2).
    */
  def plantedLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    val lineitem = t(spark, sfDir, "lineitem")
    val corrupt = lineitem.filter(col("l_orderkey") % 1000 === 2)
      .withColumn("l_orderkey", col("l_orderkey") + LineKeyOffset)
      .withColumn("l_quantity", -col("l_quantity"))
      .withColumn("l_discount", col("l_discount") + lit(2.0))
    lineitem.unionByName(corrupt)
  }

  def qIntegrity(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = plantedOrders(spark, sfDir)
    val lineitem = plantedLineitem(spark, sfDir)
    val customer = t(spark, sfDir, "customer")

    def labeled(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("check_name"), col("n"))

    val orphanLineitems = labeled("orphan_lineitems",
      lineitem.select("l_orderkey")
        .join(orders.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n")))
    val orphanOrders = labeled("orphan_orders",
      orders.select("o_custkey")
        .join(customer.select("c_custkey"), col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")))
    val dupOrderkeys = labeled("duplicate_orderkeys",
      orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).agg(count(lit(1)).as("n")))
    // one scan, all scalar predicates as conditional aggregates
    val orderScalars = orders.agg(
      sum(when(col("o_totalprice").isNull || col("o_totalprice") <= 0, 1).otherwise(0)).as("bad_price"),
      sum(when(col("o_orderdate").isNull, 1).otherwise(0)).as("null_date"))
    val lineScalars = lineitem.agg(
      sum(when(col("l_quantity") <= 0, 1).otherwise(0)).as("bad_qty"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1).otherwise(0)).as("bad_discount"))

    orphanLineitems
      .unionByName(orphanOrders)
      .unionByName(dupOrderkeys)
      .unionByName(orderScalars.select(lit("bad_order_price").as("check_name"), col("bad_price").as("n")))
      .unionByName(orderScalars.select(lit("null_order_date").as("check_name"), col("null_date").as("n")))
      .unionByName(lineScalars.select(lit("bad_lineitem_qty").as("check_name"), col("bad_qty").as("n")))
      .unionByName(lineScalars.select(lit("bad_lineitem_discount").as("check_name"), col("bad_discount").as("n")))
      .orderBy("check_name")
  }
}
