package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: exact hamming + per-band flip split of any planted pair
  * the banded simhash index missed.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata-sf1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val planted = graft.dedup.Dedup.plantedDocs(spark, sfDir)
    val fp = graft.dedup.Dedup.simhashFingerprintsOf(planted, 2).localCheckpoint()
    val off = graft.dedup.Dedup.PlantOffset
    val pairs = fp.select(col("doc_id").as("id_a"), col("sim").as("sim_a"))
      .join(fp.select((col("doc_id") - off).as("id_a"), col("sim").as("sim_b")), "id_a")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .localCheckpoint()
    println("SIMPROBE hamming histogram:")
    pairs.groupBy("hamming").count().orderBy("hamming").collect()
      .foreach(r => println(s"SIMPROBE h=${r.get(0)} n=${r.get(1)}"))
    val found = graft.dedup.Dedup.simhashPlantedRecall(spark, sfDir)
      .select("id_a").collect().map(_.getLong(0)).toSet
    val missing = pairs.collect().filterNot(r => found.contains(r.getAs[Long]("id_a")))
    missing.foreach { r =>
      val x = r.getAs[Long]("sim_a") ^ r.getAs[Long]("sim_b")
      val split = (0 until 4).map(b => java.lang.Long.bitCount((x >>> (b * 16)) & 0xFFFFL))
      println(s"SIMPROBE MISSING id_a=${r.getAs[Long]("id_a")} hamming=${r.getAs[Int]("hamming")} split=$split")
    }
    spark.stop()
  }
}
