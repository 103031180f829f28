package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.{Ivf, IvfDelete}
import graft.dedup.NearDup

object DeleteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.01"
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val del = base.filter(pmod(col("vec_id"), lit(25)) === 0).select("vec_id")
    println("nDel=" + del.count() + " nBase=" + base.count())
    import graft.functions.VectorOps
    val doomed = base.filter(pmod(col("vec_id"), lit(25)) === 0)
    val probes = NearDup.rotatedTo(doomed, 0.97)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv_unit"))
      .join(doomed.select(col("vec_id").as("probe_id"),
        sqrt(VectorOps.dot(col("embedding"), col("embedding"))).as("tnorm")), Seq("probe_id"))
      .select(col("probe_id"),
        transform(col("pv_unit"), x => (x * col("tnorm")).cast("float")).as("probe_vec"))
      .localCheckpoint()
    val cent = Ivf.trainCentroids(base, 16)
    val before = Ivf.queryIndexBounded(cent, base, probes, k = 1, nProbe = 8)
    before.withColumn("hit", col("neighbor_id") === col("probe_id"))
      .groupBy("hit").count().show()
    // direct cos(probe, target)
    val j = probes.join(base, probes("probe_id") === base("vec_id"))
      .withColumn("dot", graft.functions.VectorOps.dot(col("probe_vec"), col("embedding")))
      .withColumn("np", sqrt(graft.functions.VectorOps.dot(col("probe_vec"), col("probe_vec"))))
      .withColumn("nt", sqrt(graft.functions.VectorOps.dot(col("embedding"), col("embedding"))))
      .select(col("probe_id"), (col("dot") / col("np") / col("nt")).as("cos"))
    j.show(10)
  }
}
