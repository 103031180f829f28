package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, NearDup}

/** Diagnostic for the graded near-dup contracts: realized per-tier
  * recall / similarity stats at a given sfDir, to set the oracle pins
  * with evidence instead of hope.
  */
object NearProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import Dedup.PlantOffset

    val nElig = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 2 === 0 && regexp_count(col("text"), lit("\\S+")) >= 60)
      .count()
    println(s"NEARPROBE sf=$sfDir eligibleDocs=$nElig")

    val mh = Dedup.minhashCandidatesOf(NearDup.plantedJaccardDocs(spark, sfDir))
      .filter(col("id_a") < PlantOffset && (col("id_b") - col("id_a")) % PlantOffset === 0)
      .withColumn("k", ((col("id_b") - col("id_a")) / PlantOffset).cast("int"))
      .groupBy("k").agg(count(lit(1)).as("n"), round(avg("jaccard"), 4).as("avg_j"),
        round(min("jaccard"), 4).as("min_j"), round(max("jaccard"), 4).as("max_j"))
      .orderBy("k").collect()
    mh.foreach(r => println(s"NEARPROBE minhash k=${r.getInt(0)} n=${r.getLong(1)} " +
      s"recall=${r.getLong(1).toDouble / nElig} avgJ=${r.getDouble(2)} minJ=${r.getDouble(3)} maxJ=${r.getDouble(4)}"))

    val sh = Dedup.simhashCandidatesOf(NearDup.plantedSwapDocs(spark, sfDir), shingleN = 2)
      .filter(col("id_a") < PlantOffset && (col("id_b") - col("id_a")) % PlantOffset === 0)
      .withColumn("k", ((col("id_b") - col("id_a")) / PlantOffset).cast("int"))
      .groupBy("k").agg(count(lit(1)).as("n"), round(avg("hamming"), 2).as("avg_h"),
        max("hamming").as("max_h"))
      .orderBy("k").collect()
    sh.foreach(r => println(s"NEARPROBE simhash k=${r.getInt(0)} n=${r.getLong(1)} " +
      s"recall=${r.getLong(1).toDouble / nElig} avgHam=${r.getDouble(2)} maxHam=${r.get(3)}"))

    val nVec = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(10)) === 0).count()
    val ec = Dedup.embeddingCandidatesOf(
        NearDup.plantedCosineEmbeddings(spark, sfDir), nTables = 8, planesPerTable = 8)
      .filter(col("id_a") < PlantOffset && (col("id_b") - col("id_a")) % PlantOffset === 0)
      .withColumn("k", ((col("id_b") - col("id_a")) / PlantOffset).cast("int"))
      .groupBy("k").agg(count(lit(1)).as("n"), round(avg("cosine"), 4).as("avg_c"),
        round(min("cosine"), 4).as("min_c"))
      .orderBy("k").collect()
    ec.foreach(r => println(s"NEARPROBE embedding k=${r.getInt(0)} n=${r.getLong(1)} " +
      s"recall=${r.getLong(1).toDouble / nVec} avgC=${r.getDouble(2)} minC=${r.getDouble(3)}"))

    println("NEARPROBE ann:")
    NearDup.annNearTop1(spark, sfDir).collect().foreach(r => println(s"NEARPROBE ann $r"))
    NearDup.minhashNearRecall(spark, sfDir).collect().foreach(r => println(s"NEARPROBE q_mh $r"))
    NearDup.simhashNearRecall(spark, sfDir).collect().foreach(r => println(s"NEARPROBE q_sh $r"))
    NearDup.embeddingNearRecall(spark, sfDir).collect().foreach(r => println(s"NEARPROBE q_em $r"))
    spark.stop()
  }
}
