package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the q_skew_aqe plan pin: prints the final adaptive
  * plan of a synthetic extreme-skew join (and the scoped-conf variant
  * over real data) so the OptimizeSkewedJoin firing conditions can be
  * audited when the `skew=true` marker goes missing.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("skew-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fact = spark.range(0, 2000000, 1, 8)
      .select(when(col("id") % 10 < 8, lit(1L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("payload"))
    val dim = spark.range(0, 1000).select(col("id").as("s"), (col("id") % 25).as("g"))
    val joined = fact.join(dim, col("k") === col("s"))
      .groupBy("g").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    println("SKEWPROBE_SYNTHETIC skew=true present: " + plan.contains("skew=true"))
    println(plan.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("AQEShuffleRead") ||
        l.contains("ShuffledHashJoin")).mkString("\n"))
    spark.stop()
  }
}
