package graft.svm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField}

/** Subset-assignment strategies for the parallel-SVM meta-algorithms
  * (reference: cascade_svm/Precascade2.java:18-45 assigns each record
  * to one of 2^k subsets uniformly at random, capped at ceil(total/k)
  * per subset via a global counter).
  *
  * Two scalable re-expressions:
  *  - [[byMod]]: `pmod(id, k)` — a narrow map, no shuffle, balanced in
  *    expectation for dense ids. The default everywhere.
  *  - [[balancedRandom]]: seeded-random order + index modulo k —
  *    EXACTLY balanced (sizes differ by ≤1, the reference's cap
  *    property) and deterministic for a fixed seed. Costs one sort
  *    shuffle + a zipWithIndex pass; the global row index is computed
  *    from per-partition counts, not a global counter, so it scales.
  */
object Partitioner {

  def byMod(df: DataFrame, k: Int, idCol: String = "vec_id"): DataFrame =
    df.withColumn("subset", pmod(col(idCol), lit(k)).cast("int"))

  def balancedRandom(df: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val shuffled = df.orderBy(rand(seed), col(df.columns.head))
    val withIdx = shuffled.rdd.zipWithIndex.map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i % k).toInt)
    }
    spark.createDataFrame(withIdx,
      shuffled.schema.add(StructField("subset", IntegerType, nullable = false)))
  }

  /** Per-subset sizes of the balanced-random assignment — the balance
    * certificate (sizes are a pure function of total count and k, so an
    * external oracle can verify them without replaying the RNG).
    */
  def balancedRandomSizes(spark: SparkSession, sfDir: String, k: Int = 8): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    balancedRandom(emb, k)
      .groupBy(col("subset"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("subset")
  }
}
