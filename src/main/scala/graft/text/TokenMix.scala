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

  /** WEIGHTED token targets — the general form of the recipe knob
    * ("2 parts src0-4, 1 part the rest", in TOKENS): with integer
    * weight parts w_s and P = Σw, the achievable mixture size is
    * T = min_s(total_s·P div w_s) (the limiting source is kept whole
    * up to `div` rounding) and each source's budget is
    * w_s·T div P ≤ total_s by the floor inequality — all exact integer
    * `div`, engine-identical, no rates and no floats anywhere. The
    * per-source selection is the same deterministic doc_id-ordered
    * prefix as the uniform case. Output adds the realized share in
    * basis points, which must track w_s/P — the number the recipe
    * review checks.
    */
  def corpusMixTokensWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("nt"))
      .localCheckpoint()

    val all = Window.partitionBy()
    val budgets = toks.groupBy("source").agg(sum("nt").as("total"))
      .withColumn("w",
        when(substring(col("source"), 4, 10).cast("int") < 5, lit(2L)).otherwise(lit(1L)))
      .withColumn("p", sum("w").over(all))
      .withColumn("t",
        min(call_function("div", col("total") * col("p"), col("w"))).over(all))
      .select(col("source"), col("w"),
        call_function("div", col("w") * col("t"), col("p")).as("token_budget"))

    val bySrc = Window.partitionBy("source").orderBy("doc_id")
    val kept = toks
      .withColumn("cum", sum("nt").over(bySrc))
      .join(broadcast(budgets), "source")
      .filter(col("cum") <= col("token_budget"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_kept"), sum("nt").as("tokens_kept"),
        min("token_budget").as("token_budget"), min("w").as("w"))
    kept
      .withColumn("kept_total", sum("tokens_kept").over(all))
      .select(col("source"), col("w"), col("n_docs_kept"), col("tokens_kept"),
        col("token_budget"),
        call_function("div", col("tokens_kept") * lit(10000L), col("kept_total"))
          .as("share_bp"))
      .orderBy("source")
  }

  val oracleSqlWeighted: String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    CAST(length(regexp_extract_all(text, '[A-Za-z]+')) + length(regexp_extract_all(text, '[0-9]+')) + length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS nt
       |  FROM documents
       |), tot AS (
       |  SELECT source, sum(nt) AS total,
       |    CASE WHEN CAST(substring(source, 4) AS INT) < 5 THEN 2 ELSE 1 END AS w
       |  FROM t GROUP BY source
       |), bd AS (
       |  SELECT source, w, (w * min((total * p) // w) OVER ()) // p AS token_budget
       |  FROM (SELECT *, sum(w) OVER () AS p FROM tot)
       |), c AS (
       |  SELECT source, nt,
       |    sum(nt) OVER (PARTITION BY source ORDER BY doc_id) AS cum FROM t
       |), kept AS (
       |  SELECT c.source, nt, w, token_budget FROM c JOIN bd ON c.source = bd.source
       |  WHERE cum <= token_budget
       |), per AS (
       |  SELECT source, min(w) AS w, count(*) AS n_docs_kept, sum(nt) AS tokens_kept,
       |    min(token_budget) AS token_budget
       |  FROM kept GROUP BY source
       |)
       |SELECT source, CAST(w AS BIGINT) AS w, CAST(n_docs_kept AS BIGINT) AS n_docs_kept,
       |  CAST(tokens_kept AS BIGINT) AS tokens_kept,
       |  CAST(token_budget AS BIGINT) AS token_budget,
       |  CAST((tokens_kept * 10000) // (sum(tokens_kept) OVER ()) AS BIGINT) AS share_bp
       |FROM per ORDER BY source""".stripMargin

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
