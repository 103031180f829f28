package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet layout — at 100 TB the FIRST lever:
  * a filter on the partition column prunes whole directories at
  * planning time (PartitionFilters in the scan), so a
  * one-partition-value query reads 1/N of the data before a single
  * row filter runs. Complements `sources/Bucketed` (bucketing prunes
  * shuffles; partitioning prunes IO).
  */
object Partitioned {

  /** Write `df` partitioned by `cols` (directory per value). */
  def write(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Read back; filters on the partition columns become
    * PartitionFilters (planning-time pruning), never data filters.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Copy the events table into an event_type-partitioned layout at
    * `path` — the canonical "partition the firehose by its hot filter
    * column" preparation step.
    */
  def partitionEvents(spark: SparkSession, sfDir: String, path: String): Unit =
    write(
      graft.queries.Analytics.loadEvents(spark, sfDir)
        .withColumn("ts", unix_micros(col("ts"))), // plain long: partition layout demo, not time semantics
      path, "event_type")
}
