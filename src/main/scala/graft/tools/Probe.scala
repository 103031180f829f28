package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc single-query timing/explain probe: Probe <queryName> [sfDir].
  * Runs the query three times (warm JVM separates codegen-compile cost
  * from execution cost); set PROBE_EXPLAIN=1 for the formatted plan.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.Bench.materialize(fn(spark, sfDir))
      println(f"PROBE $name round=$round t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (sys.env.contains("PROBE_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
