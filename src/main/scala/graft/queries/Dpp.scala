package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning over a star-schema layout
  * (SURVEY.md §2b).
  *
  * The 100 TB shape: the fact table is physically partitioned by a
  * dimension foreign key (here: the supplying nation), and queries
  * filter the DIMENSION by an attribute (`r_name = 'ASIA'`). A static
  * planner cannot prune fact partitions — the surviving nation keys
  * are only known after the dim filter runs — so Spark's dynamic
  * partition pruning inserts a runtime subquery: the broadcast dim
  * result doubles as a partition filter on the fact scan, and 20 of
  * the 25 nation directories are never read. The pruning is
  * semantically invisible, so the oracle is the plain 4-table join.
  *
  * The partitioned layout is (re)written by the query itself into a
  * deterministic per-user dir — same discipline as
  * `CorpusShard.writeShards`; in production the layout is written
  * once and queried many times, so the write is the amortized cost.
  * `spark.sql.optimizer.dynamicPartitionPruning.enabled` is on by
  * default; PlanAuditSpec pins the `dynamicpruningexpression` in the
  * fact scan rather than trusting the default silently.
  */
object Dpp {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Writes (overwrite) the nation-partitioned fact and returns its
    * path — one directory per supplying nation, each written by one
    * task (repartition on the partition key first).
    */
  def writePartitionedFact(spark: SparkSession, sfDir: String): String = {
    val out = graft.util.TempDirs.forInput(sfDir, "dpp")
    val supplier = t(spark, sfDir, "supplier").select("s_suppkey", "s_nationkey")
    t(spark, sfDir, "lineitem")
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_extendedprice"), col("l_discount"), col("s_nationkey").as("n"))
      .repartition(col("n"))
      .write.mode("overwrite").partitionBy("n").parquet(out)
    out
  }

  /** The pruned star join: revenue by ASIAn supplying nation. */
  def prunedJoin(spark: SparkSession, factPath: String, sfDir: String): DataFrame = {
    val fact = spark.read.parquet(factPath)
    val dim = t(spark, sfDir, "nation")
      .join(broadcast(t(spark, sfDir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    fact
      .join(broadcast(dim), fact("n") === dim("n_nationkey"))
      .groupBy(col("n").cast("long").as("n"))
      .agg(count(lit(1)).as("n_items"),
        Analytics.moneyRevenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("n")
  }

  def qDpp(spark: SparkSession, sfDir: String): DataFrame =
    prunedJoin(spark, writePartitionedFact(spark, sfDir), sfDir)
}
