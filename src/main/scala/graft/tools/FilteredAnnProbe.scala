package graft.tools

import org.apache.spark.sql.functions._
import graft.similarity.{FilteredAnn, Ivf}

/** Diagnostic: the ann_filtered hit/decoy RATES (not just the gate
  * booleans), so the contract bar is pinned from measurement.
  */
object FilteredAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val data = FilteredAnn.taggedCorpus(spark, sfDir, 50, 0.97).localCheckpoint()
    val probes = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val cent = Ivf.trainCentroids(data.select("vec_id", "embedding"), 16)
    val index = Ivf.assign(data, cent)
    val filtered = FilteredAnn.queryIndexFiltered(cent, index, data, probes,
      1, 4, col("allowed"))
    val unfiltered = Ivf.queryIndex(cent, index,
      data.select("vec_id", "embedding"), probes, 1, 4)
    val n = probes.count()
    val hits = filtered.filter(
      col("neighbor_id") === col("probe_id") + FilteredAnn.PassOffset &&
        col("cosine") < 1.0).count()
    val decoy = unfiltered.filter(
      col("neighbor_id") === col("probe_id") + FilteredAnn.FailOffset).count()
    println(f"FILTANN sf=$sfDir n=$n hitRate=${hits.toDouble / n}%.4f " +
      f"decoyRate=${decoy.toDouble / n}%.4f")
    spark.stop()
  }
}
