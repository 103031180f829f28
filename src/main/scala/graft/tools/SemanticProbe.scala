package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, NearDup, Semantic}
import graft.text.QualitySvm

/** One-off diagnostic for the semantic-dedup contracts: prints raw
  * per-tier co-cluster+threshold recalls (not just the pinned
  * booleans) so thresholds can be set with evidence, plus the quality
  * SVM per-class eval table. Usage:
  *   runMain graft.tools.SemanticProbe [sfDir ...]
  */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("semantic-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- dirs) {
      println(s"=== $d")
      val e = spark.read.parquet(s"$d/embeddings.parquet").select("vec_id", "embedding")
      val base = e.filter(pmod(col("vec_id"), lit(10)) === 0)
      val nPlanted = base.count()
      val planted = NearDup.plantedCosineFrom(e, base).persist()
      val t0 = System.nanoTime()
      val cands = Semantic.semanticCandidatesOf(planted)
        .filter(col("id_a") < Dedup.PlantOffset && col("id_b") > col("id_a") &&
          (col("id_b") - col("id_a")) % Dedup.PlantOffset === 0)
        .withColumn("k", ((col("id_b") - col("id_a")) / Dedup.PlantOffset).cast("int"))
        .groupBy("k").agg(count(lit(1)).as("n"), avg("cosine").as("mean_cos"))
        .collect()
      println(s"  nPlanted=$nPlanted  candidates in ${(System.nanoTime()-t0)/1e9}%.2f s")
      cands.sortBy(_.getInt(0)).foreach(r =>
        println(f"  tier k=${r.getInt(0)} co-cluster recall=${r.getLong(1).toDouble/nPlanted}%.4f mean_cos=${r.getDouble(2)}%.4f"))
      planted.unpersist()
      println("  clusterRecall:")
      Semantic.clusterRecall(spark, d).collect().foreach(r => println(s"    $r"))
      println("  semanticDedupRecall:")
      Semantic.semanticDedupRecall(spark, d).collect().foreach(r => println(s"    $r"))
      println("  qualitySvm:")
      QualitySvm.qualitySvm(spark, d).collect().foreach(r => println(s"    $r"))
    }
    spark.stop()
  }
}
