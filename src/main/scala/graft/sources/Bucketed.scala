package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table sink: the 100 TB co-location technique. Writing both
  * sides of a recurring join bucketed (and sorted) by the join key lets
  * every subsequent join run shuffle-free — each bucket pair joins
  * locally, so the O(data) exchange is paid once at write time instead
  * of on every query.
  *
  * The reference has no analogue (every MapReduce job re-shuffles its
  * input); on Spark this is the difference between an O(100 TB) network
  * transfer per join and none.
  */
object Bucketed {

  /** Write `df` as a managed bucketed table (sorted within buckets, so
    * joins can also use sort-merge without an extra sort).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True iff the physical plan of `df` contains no shuffle exchange —
    * how the specs prove a bucketed join is co-located. Matches hash,
    * range and single-partition exchanges but not BroadcastExchange
    * (which moves a small side, not the data).
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !"(?<![A-Za-z])Exchange ".r
      .findFirstIn(df.queryExecution.executedPlan.toString)
      .isDefined
}
