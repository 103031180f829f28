package graft.tools

import graft.queries.VariantOps

/** Times q_variant_extract's two halves separately: the one-time
  * physical shred (construct+parse+write) vs the recurring typed read
  * path — the split BASELINE.md quotes for the amortization claim.
  * Usage: runMain graft.tools.VariantReadProbe [sfDir]
  */
object VariantReadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var path: String = null
    val shred1 = t { path = VariantOps.writeShredded(spark, sfDir) }
    val read1 = t { graft.Bench.materialize(VariantOps.aggShredded(spark.read.parquet(path))) }
    val shred2 = t { path = VariantOps.writeShredded(spark, sfDir) }
    val read2 = t { graft.Bench.materialize(VariantOps.aggShredded(spark.read.parquet(path))) }
    println(f"VARPROBE shred=$shred1%.2f/$shred2%.2f read=$read1%.2f/$read2%.2f")
    spark.stop()
  }
}
