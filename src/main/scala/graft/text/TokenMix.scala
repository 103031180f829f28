package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TOKEN-weighted mixture rebalancing (SURVEY.md §2c) — pretraining
  * mixtures are specified in tokens, not documents ("15% code, 30%
  * web" means token shares), and `corpus_mix`'s doc-count sampling
  * silently skews whenever per-source document lengths differ. This
  * operator balances to the UNIFORM TOKEN mixture: budget B = the
  * smallest source's token total, and every source keeps its
  * deterministic doc_id-ordered prefix whose running token sum stays
  * within B — exact integers, no sampling randomness, reproducible
  * from the corpus alone.
  *
  * Scale shape: one scan computes (doc, source, tokens); the
  * per-source running sum is a source-partitioned window — at real
  * scale a source's docs outgrow one partition and this becomes the
  * SeqPack two-level prefix sum (per-bucket totals + intra-bucket
  * cumsum), the documented upgrade path; the budget row is a
  * |sources|-row aggregate broadcast back. Output is the per-source
  * census (docs kept, tokens kept, basis-point utilization of B) —
  * the table a mixture config review actually reads.
  */
object TokenMix {

  def corpusMixTokens(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("nt"))
      .localCheckpoint() // feeds the budget agg AND the prefix scan

    val budget = toks.groupBy("source").agg(sum("nt").as("src_total"))
      .agg(min("src_total").as("b"))

    val bySrc = Window.partitionBy("source").orderBy("doc_id")
    toks
      .withColumn("cum", sum("nt").over(bySrc))
      .crossJoin(broadcast(budget))
      .filter(col("cum") <= col("b"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs_kept"),
        sum("nt").as("tokens_kept"),
        min("b").as("token_budget"))
      .select(col("source"), col("n_docs_kept"), col("tokens_kept"),
        col("token_budget"),
        call_function("div", col("tokens_kept") * lit(10000L), col("token_budget"))
          .as("fill_bp"))
      .orderBy("source")
  }

  /** Same exact-integer pipeline; tokenization mirrored via the
    * shared bpe-ish regex count.
    */
  val oracleSql: String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    CAST(length(regexp_extract_all(text, '[A-Za-z]+')) + length(regexp_extract_all(text, '[0-9]+')) + length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS nt
       |  FROM documents
       |), b AS (
       |  SELECT min(s) AS b FROM (SELECT sum(nt) AS s FROM t GROUP BY source)
       |), c AS (
       |  SELECT source, nt,
       |    sum(nt) OVER (PARTITION BY source ORDER BY doc_id) AS cum FROM t
       |), kept AS (
       |  SELECT source, nt FROM c CROSS JOIN b WHERE cum <= b
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
       |  CAST(sum(nt) AS BIGINT) AS tokens_kept,
       |  (SELECT CAST(b AS BIGINT) FROM b) AS token_budget,
       |  CAST((sum(nt) * 10000) // (SELECT b FROM b) AS BIGINT) AS fill_bp
       |FROM kept GROUP BY source ORDER BY source""".stripMargin
}
