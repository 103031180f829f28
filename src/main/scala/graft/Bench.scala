package graft
import org.apache.spark.sql.SparkSession
/** Driver-run benchmark: every SparkEntry query timed at the given
  * scale factor. Each query runs twice and reports the faster (warm)
  * time — the first pass pays plan compilation + codegen, which on a
  * long-lived cluster is amortized across thousands of runs; cold
  * times are kept in `queries_cold` for reference.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: session/executor init, parquet footer reads and
    // first-job codegen otherwise land on whichever query runs first.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      // A failed query must be loud AND visible in the JSON (-1 time,
      // listed under "failed") — recording its fast elapsed time would
      // silently poison the benchmark.
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
      }
    }
    // Inter-query hygiene: memory-sink temp views (streaming queries
    // register one per run, holding Complete-mode results in driver
    // memory) and any cached plans must not tax later queries' GC —
    // round-2 bench showed the four alphabetically-post-streaming svm_*
    // queries inflated 2.7-8.5× versus their isolated-JVM times, while
    // every query measured clean in a fresh JVM. The explicit GC pays a
    // bounded pause OUTSIDE the timed region instead of unbounded
    // collector debt inside the next query's timing.
    def cleanup(): Unit = {
      spark.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
      spark.catalog.clearCache()
      System.gc()
    }
    // name order: stable run-to-run and round-to-round for diffing
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = timeOnce(name, fn)
      val warm = timeOnce(name, fn)
      val best = (cold.toSeq ++ warm.toSeq).minOption
      cleanup()
      (name, best, cold)
    }
    def jnum(v: Option[Double]): String = v.map(_.toString).getOrElse("-1")
    def jmap(kv: Seq[(String, Option[Double])]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    val failed = results.collect { case (n, None, _) => "\"" + n + "\"" }
    val total = results.flatMap(_._2).sum
    val qs = jmap(results.map(r => r._1 -> r._2))
    val cold = jmap(results.map(r => r._1 -> r._3))
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$cold,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
