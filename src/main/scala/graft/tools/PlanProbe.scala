package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of a named SparkEntry query —
  * the `.explain("formatted")` audit loop (scan pruning, pushed
  * filters, exchange count, codegen spans) without writing a
  * throwaway main each time.
  *
  *   sbt "runMain graft.tools.PlanProbe <queryName> [sfDir]"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: PlanProbe <queryName> [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    // run it so AQE's final plan (with materialized codegen spans) prints too
    df.collect()
    println("==== final adaptive plan ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
