package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: how does the driver's TIMESTAMP(NANOS) events.ts column
  * infer with/without the legacy nanosAsLong flag, and is the flag
  * effective when set AFTER a first read (schema/footers cached)?
  */
object TsProbe {
  def main(args: Array[String]): Unit = {
    val p = "/root/testdata/sf0.001/events.parquet"
    val spark = SparkSession.builder().master("local[2]").appName("tsprobe")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    println("flag first:  " + spark.read.parquet(p).schema("ts").dataType)
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    println("flag unset:  " + spark.read.parquet(p).schema("ts").dataType)
    spark.stop()
  }
}
