package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev probe: per-planted-pair simhash fingerprints, hamming distance,
  * and band agreement — for tuning the planted-recall contract.
  */
object SimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8).appName("simprobe").getOrCreate()
    val fp = Dedup.simhashFingerprintsOf(Dedup.plantedDocs(spark, sfDir), 2)
    val a = fp.filter(col("doc_id") < Dedup.PlantOffset)
      .select(col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val b = fp.filter(col("doc_id") >= Dedup.PlantOffset)
      .select((col("doc_id") - Dedup.PlantOffset).as("id_a"), col("sim").as("sim_b"))
    a.join(b, "id_a")
      .select(col("id_a"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"),
        array((0 until 4).map { bnd =>
          shiftrightunsigned(col("sim_a"), bnd * 16).bitwiseAND(0xFFFFL) ===
            shiftrightunsigned(col("sim_b"), bnd * 16).bitwiseAND(0xFFFFL)
        }: _*).as("band_eq"))
      .orderBy("id_a")
      .collect()
      .foreach(r => println(s"SIMPROBE ${r.getLong(0)} ham=${r.getInt(1)} bands=${r.getSeq[Boolean](2).mkString(",")}"))
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 20 === 0 && col("n_chars") >= 200).count()
    val recovered = Dedup.simhashPlantedRecall(spark, sfDir).count()
    println(s"SIMRECALL expected=$expected recovered=$recovered")
    spark.stop()
  }
}
