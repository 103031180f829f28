package graft.tools
import org.apache.spark.sql.SparkSession
/** Sequence probe: run the named queries in order, each twice, to
  * expose cross-query session-state interference. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args; round <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.Bench.materialize(graft.SparkEntry.queries(name)(spark, sfDir))
      println(f"PROBE2 $name round=$round t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
