package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the SolverPin rows — the measurement behind svm_solver_pin's
  * literal oracle (values must equal the closed-form optima exactly).
  */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.svm.SolverPin.solverPin(spark, "unused").collect()
      .foreach(r => println(s"PIN $r"))
    spark.stop()
  }
}
