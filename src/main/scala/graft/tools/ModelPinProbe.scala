package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the svm_model_io stats row — the values pinned as literals in
  * SparkEntry.oracleSql. Run after any change to RingData / Smo /
  * ModelIO to recompute the pin (the pin verifies determinism; a
  * legitimate solver change shifts it once).
  */
object ModelPinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.svm.SvmQueries.modelIo(spark, "/root/testdata/sf0.001")
      .collect().foreach(r => println(s"PIN ${r.getString(0)} = ${r.getDouble(1)}"))
    spark.stop()
  }
}
