package graft.tools

import org.apache.spark.sql.SparkSession

/** Batch [[PlanProbe]]: write `plans/<dir>/<query>_<suffix>.txt` files
  * holding the `.explain("formatted")` output (plus the final adaptive
  * plan after execution) for MANY named SparkEntry queries in one JVM —
  * the round-14 optimization deliverable wants a before/after plan file
  * per touched query, and one sbt fork per file would dominate the
  * capture time.
  *
  *   sbt "runMain graft.tools.PlanDump <dir> <suffix> <sfDir> <q1> <q2> ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <dir> <suffix> <sfDir> <query...>")
    val Array(dir, suffix, sfDir) = args.take(3)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    names.foreach { name =>
      val out = new java.io.ByteArrayOutputStream()
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
          df.explain("formatted")
          df.collect()
          println("==== final adaptive plan ====")
          println(df.queryExecution.executedPlan.toString)
        }
      } catch {
        case e: Throwable =>
          out.write(s"PLAN CAPTURE FAILED: $e\n".getBytes("UTF-8"))
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"${name}_$suffix.txt"), out.toByteArray)
      System.err.println(s"[plandump] wrote $dir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
