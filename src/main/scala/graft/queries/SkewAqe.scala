package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE runtime skew-join splitting (SURVEY.md §2b) — the AUTOMATIC
  * counterpart to [[SaltedJoin]]'s manual salting: plant a hot key
  * (80% of the fact table remapped onto one supplier), shuffle-join
  * it, and let OptimizeSkewedJoin split the oversized partition into
  * parallel sub-reads at runtime. The contract is that the re-plan is
  * INVISIBLE in the result: the oracle is the plain join over the
  * same remap, and the spec separately pins `skew=true` in the final
  * adaptive plan — detection AND correctness, not one without the
  * other.
  *
  * Conf scoping: AQE's skew thresholds (256 MB partition, 5× median)
  * are sized for production shuffles; at test SF the hot partition is
  * ~1 MB, so the operator scopes the thresholds down — and disables
  * broadcast — ONLY to make the small corpus exhibit the 100 TB
  * shape (a dimension table that can't broadcast, a sort-merge join
  * with one pinned partition). Session values are restored in a
  * finally; the frame is materialized inside the scope (the
  * `q_recursive_cte` pattern).
  */
object SkewAqe {

  private val ScopedConfs = Map(
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.shuffle.partitions" -> "16",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  def qSkewAqe(spark: SparkSession, sfDir: String): DataFrame =
    withScopedConfs(spark) { resolved(spark, sfDir).localCheckpoint() }

  /** The un-checkpointed frame — the spec collects it INSIDE the
    * scope and reads `skew=true` off the final adaptive plan.
    */
  private[queries] def resolved(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        when(col("l_orderkey") % 10 < 8, lit(1L))
          .otherwise(col("l_suppkey")).as("k"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("q"))
      // a skewed reduce partition splits at MAPPER granularity: the
      // test parquet is one row group = ONE map task, which leaves
      // nothing to split (measured: the rule never fires) — round-robin
      // to 8 mappers, the shape a real cluster scan has for free
      .repartition(8)
    val dim = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey"))
    fact.join(dim, col("k") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"), sum(col("q")).as("sum_qty"))
      .orderBy("s_nationkey")
  }

  private[queries] def withScopedConfs[A](spark: SparkSession)(body: => A): A = {
    val prev = ScopedConfs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
    ScopedConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Oracle: the remapped plain join — the re-plan must be invisible. */
  val oracleSql: String =
    """WITH f AS (
      |  SELECT CASE WHEN l_orderkey % 10 < 8 THEN 1 ELSE l_suppkey END AS k,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
      |  FROM lineitem
      |)
      |SELECT s_nationkey, count(*) AS n_items, CAST(sum(q) AS BIGINT) AS sum_qty
      |FROM f JOIN supplier ON k = s_suppkey
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
