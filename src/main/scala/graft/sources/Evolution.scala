package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-operational write/read semantics (SURVEY.md §2e): schema
  * evolution across file generations and dynamic partition overwrite —
  * the two mutations every long-lived 100 TB dataset undergoes.
  *
  * Schema evolution: generation 1 files lack a column that generation
  * 2 adds. `mergeSchema` unifies the footers at planning time; rows
  * from old files surface the new column as null. The expensive part
  * at scale is footer collection, which is why merged-schema reads are
  * for EVOLVING datasets, not a substitute for a catalog — both facts
  * spec-pinned (the merged read sees the union schema; a plain read of
  * a mixed directory picks an arbitrary footer and must not be relied
  * on).
  *
  * Dynamic partition overwrite: `partitionOverwriteMode=dynamic` makes
  * `SaveMode.Overwrite` replace ONLY the partitions present in the
  * incoming batch — the daily-restatement shape (rewrite one day,
  * never truncate the table). Static mode (the default) would clear
  * every partition; the spec pins the difference by proving untouched
  * partitions survive byte-identically.
  */
object Evolution {

  /** Two-generation dataset at `path`: gen-1 (o_orderkey, month,
    * total), gen-2 adds `priority`. Returns (gen1 rows, gen2 rows).
    */
  def writeEvolved(spark: SparkSession, sfDir: String, path: String): (Long, Long) = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), (col("o_orderkey") % 12).as("month"),
        col("o_totalprice").as("total"), col("o_orderpriority"))
    val gen1 = orders.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "month", "total")
    val gen2 = orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("month"), col("total"),
        col("o_orderpriority").as("priority"))
    gen1.write.mode(SaveMode.Overwrite).parquet(path)
    gen2.write.mode(SaveMode.Append).parquet(path)
    (gen1.count(), gen2.count())
  }

  /** Merged-schema read: the union schema, old rows null-filled. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Month-partitioned orders + a dynamic restatement of ONE month:
    * rewrites `month=restateMonth` with doubled totals, leaves every
    * other partition untouched. Returns the table path.
    */
  def dynamicRestate(spark: SparkSession, sfDir: String, path: String,
                     restateMonth: Int = 3): Unit = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), (col("o_orderkey") % 12).as("month"),
        col("o_totalprice").as("total"))
    Partitioned.write(orders, path, "month")
    val restated = orders.filter(col("month") === restateMonth)
      .withColumn("total", col("total") * 2)
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try restated.write.mode(SaveMode.Overwrite).partitionBy("month").parquet(path)
    finally prior match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
