package graft.dedup

import graft.SparkSpec
import graft.similarity.{Ann, Ivf}
import org.apache.spark.sql.functions._

/** The planted-duplicate recall contracts behind the oracle-verified
  * dedup/ANN queries: every planted near-dup (or exact-dup) must be
  * RECOVERED by the bucketed pipelines — recall is part of the query
  * result, not a best-effort summary.
  */
class PlantedRecallSpec extends SparkSpec {

  private def plantedDocCount(sfDir: String): Long =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 20 === 0 && col("n_chars") >= 200).count()

  test("minhash LSH recovers every planted near-dup above threshold") {
    val out = Dedup.minhashPlantedRecall(spark, sf0001).collect()
    assert(out.length == plantedDocCount(sf0001))
    assert(out.forall(_.getAs[Double]("jaccard") >= 0.8))
    assert(out.forall(r => r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + Dedup.PlantOffset))
  }

  test("simhash multiprobe recovers every planted near-dup") {
    // Hamming-1 multiprobe makes candidate generation structural for
    // pairs within hamming 7 (pigeonhole over 4 bands); the planted
    // pairs sit at hamming 0-8 and all must come back.
    val out = Dedup.simhashPlantedRecall(spark, sf0001).collect()
    assert(out.length == plantedDocCount(sf0001))
  }

  test("embedding LSH recovers every planted exact-dup at cosine 1.0") {
    val expected = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") % 25 === 0).count()
    val out = Dedup.embeddingPlantedRecall(spark, sf0001).collect()
    assert(out.length == expected)
    assert(out.forall(_.getAs[Double]("cosine") == 1.0))
  }

  test("LSH ANN returns the planted duplicate as top-1 for every probe") {
    val out = Ann.lshPlantedTop1(spark, sf0001).collect()
    val probes = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") % 50 === 0).count()
    assert(out.length == probes)
    assert(out.forall(r =>
      r.getAs[Long]("neighbor_id") == r.getAs[Long]("probe_id") + 1000000L &&
        r.getAs[Double]("cosine") == 1.0))
  }

  test("IVF ANN returns the planted duplicate as top-1 for every probe") {
    val out = Ivf.ivfPlantedTop1(spark, sf0001).collect()
    val probes = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") % 50 === 0).count()
    assert(out.length == probes)
    assert(out.forall(r =>
      r.getAs[Long]("neighbor_id") == r.getAs[Long]("probe_id") + 1000000L &&
        r.getAs[Double]("cosine") == 1.0))
  }
}
