package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic exact-k stratified sampling (SURVEY.md §2c): the
  * eval-holdout shape — EXACTLY min(k, |stratum|) documents per
  * language, reproducible across runs, cluster sizes, and
  * partitionings, with no RNG state to ship.
  *
  * `corpus_split`/`corpus_mix` are RATE-based (each row keeps/drops
  * itself independently); a fixed-size holdout needs a per-stratum
  * RANK. The rank key is an LCG permutation of doc_id — exact integer
  * arithmetic (multiplier small enough that BIGINT never overflows in
  * either engine), so the oracle reproduces the selection
  * bit-for-bit. The rank-k cut is `row_number() ≤ k` over
  * (partition = lang), which Spark executes as WindowGroupLimit:
  * per-partition top-k heaps BEFORE the stratum shuffle, so at
  * 100 TB the exchange carries ~k rows per stratum per map
  * partition, not the corpus.
  */
object Sample {

  private val K = 50
  // glibc LCG constants; doc_id·A + C stays far below 2^63 for any
  // realistic id space, so DuckDB's checked BIGINT arithmetic agrees
  private val A = 1103515245L
  private val C = 12345L
  private val M = 2147483648L

  def qSampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    val byLang = Window.partitionBy("lang")
      .orderBy(col("r"), col("doc_id"))
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"))
      .withColumn("r", (col("doc_id") * A + C) % M)
      .withColumn("rk", row_number().over(byLang))
      .filter(col("rk") <= K)
      .select(col("lang"), col("doc_id"), col("rk").cast("long").as("rk"))
      .orderBy("lang", "rk")
  }
}
