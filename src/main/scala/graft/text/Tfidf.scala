package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document salient terms (SURVEY.md §2c): top-3 tokens per doc
  * by tf·N/df — the tf-idf ranking with the idf log dropped, because
  * log is a transcendental whose last-ulp differences across libm
  * implementations can flip a ranking tie (the repo's exact-oracle
  * rule), while tf·N and df are exact integers and ONE correctly-
  * rounded IEEE division is bit-identical in every engine. The
  * ranking tf·N/df induces is the same monotone order as tf·log-idf
  * for fixed tf ties; salience contrasts, which is what the operator
  * is for, survive.
  *
  * Shapes: per-doc tf is a map-side-combined (doc_id, tok) count; df
  * reuses the ALREADY-REDUCED tf rows (one row per doc×token), so
  * the vocabulary pass never re-touches the corpus; the score join
  * shuffles on token; the top-3 cut is `row_number ≤ 3` over doc_id,
  * which runs as WindowGroupLimit. No broadcast of the vocabulary —
  * same Zipf reasoning as `RareTokens`.
  */
object Tfidf {

  private val K = 3

  def tfidfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val n = docs.count() // corpus size: one scalar, stats-grade collect

    val tf = docs
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))

    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok"))
    tf.join(df, "tok")
      .withColumn("score", (col("tf") * n).cast("double") / col("df"))
      .withColumn("rk", row_number().over(byDoc))
      .filter(col("rk") <= K)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("tok"), col("score"))
      .orderBy("doc_id", "rk")
  }
}
