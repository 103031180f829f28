package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnoses the planted-chain Jaccard margins behind
  * [[graft.dedup.Cluster.nearDupSurvivors]]: for each sfDir argument,
  * prints the min/max verified Jaccard of intended edges (a–b, b–c)
  * and of the intended NON-edge (a–c) — the survivor oracle is only
  * sound while min(edge) and max(non-edge) straddle the threshold with
  * margin.
  */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (dir <- dirs) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val elig = graft.dedup.NearDup.eligibleDocs(spark, dir, 2, 60)
      val corpus = graft.dedup.Cluster.chainDocs(d, elig)
      val off = graft.dedup.Dedup.PlantOffset
      val cands = graft.dedup.Dedup.minhashCandidatesOf(corpus)
        .filter((col("id_b") - col("id_a")) % off === 0 && col("id_b") > col("id_a"))
        .withColumn("ka", (col("id_a") / off).cast("int"))
        .withColumn("kb", (col("id_b") / off).cast("int"))
        .withColumn("link", concat(col("ka"), lit("-"), col("kb")))
      cands.groupBy("link")
        .agg(count(lit(1)).as("n"), min("jaccard").as("min_j"),
          max("jaccard").as("max_j"), avg("jaccard").as("mean_j"))
        .orderBy("link")
        .collect().foreach(r => println(s"CHAIN $dir $r"))
      println(s"CHAIN $dir n_eligible=${elig.count()}")
      // cross-chain / natural pairs that could corrupt the closure: any
      // candidate NOT on the same chain (id distance not a multiple of
      // the offset) — after salting these must all sit far below 0.85.
      val cross = graft.dedup.Dedup.minhashCandidatesOf(corpus)
        .filter((col("id_b") - col("id_a")) % off =!= 0)
      val xr = cross.agg(count(lit(1)).as("n"),
        coalesce(max("jaccard"), lit(0.0)).as("max_j")).head()
      println(s"CHAIN $dir cross_pairs n=${xr.getLong(0)} max_j=${xr.get(1)}")
    }
    spark.stop()
  }
}
