package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Systematic ∝-token sampling (SURVEY.md §2c) — the curation
  * sampling step that draws documents with probability proportional
  * to their TOKEN COUNT (inspection samples, eval slices, and
  * per-token-statistics estimators all want length-biased draws —
  * uniform doc sampling under-represents exactly the long documents
  * that dominate the token budget). Randomized PPS (A-ES keys
  * rand^(1/w)) is float- and seed-dependent; this is the
  * DETERMINISTIC systematic form: within each source, docs in doc_id
  * order carry their cumulative token weight, and doc i is picked iff
  * its weight interval crosses a multiple of W/K — equivalently
  * `(cum·K div W) > ((cum−nt)·K div W)`, all exact integer
  * arithmetic, reproducible from the corpus alone, inclusion
  * probability ∝ tokens by construction. At most K docs per source
  * (exactly K unless one doc spans ≥ 2 multiples).
  *
  * Shape: one tokenization scan; per-source window cumsum (at real
  * scale the SeqPack two-level prefix sum — the TokenMix upgrade
  * path); the |sources|-row totals broadcast back; census rollup per
  * source. cum·K ≤ W·K ≈ 5·10¹⁴ at 100 TB — int64 headroom holds.
  */
object TokenSample {

  private val K = 50L // picks per source

  def corpusSampleTokens(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("nt"))
      .localCheckpoint() // feeds the totals agg AND the prefix scan

    val totals = toks.groupBy("source").agg(sum("nt").as("w"))

    val bySrc = Window.partitionBy("source").orderBy("doc_id")
    toks
      .withColumn("cum", sum("nt").over(bySrc))
      .join(broadcast(totals), "source")
      .filter(
        call_function("div", col("cum") * lit(K), col("w")) >
          call_function("div", (col("cum") - col("nt")) * lit(K), col("w")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_picked"),
        sum("nt").as("tokens_picked"),
        sum("doc_id").as("id_sum"))
      .orderBy("source")
  }

  val oracleSql: String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    CAST(length(regexp_extract_all(text, '[A-Za-z]+')) + length(regexp_extract_all(text, '[0-9]+')) + length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS nt
       |  FROM documents
       |), c AS (
       |  SELECT source, doc_id, nt,
       |    sum(nt) OVER (PARTITION BY source ORDER BY doc_id) AS cum,
       |    sum(nt) OVER (PARTITION BY source) AS w
       |  FROM t
       |), picked AS (
       |  SELECT source, doc_id, nt FROM c
       |  WHERE (cum * 50) // w > ((cum - nt) * 50) // w
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_picked,
       |  CAST(sum(nt) AS BIGINT) AS tokens_picked,
       |  CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM picked GROUP BY source ORDER BY source""".stripMargin
}
