package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bigram-LM "surprise" quality filter (SURVEY.md §2c) — the
  * KenLM-style perplexity gate of a pretraining pipeline: fit a
  * bigram language model ON the corpus itself, score every document
  * by how surprising its word transitions are under that model, and
  * surface the outliers (gibberish, wrong-language shards, boilerplate
  * explosions score high; fluent text scores low). The reference
  * engine has nothing like it; a 100 TB curation run cannot ship
  * without it.
  *
  * EXACT cross-engine arithmetic instead of floating log-probs: with
  * add-one smoothing p(b|a) = (c_ab+1)/(c_a+V), the per-bigram
  * surprise is the integer
  * floor(log2 1/p) = bitlen((c_a+V) div (c_ab+1)) − 1 — bit length
  * of an exact integer quotient (`conv(q,10,2)` string length here,
  * `printf('%b',q)` in the DuckDB oracle), so the scores are
  * bit-identical in any engine: no libm, no accumulation order, no
  * tolerance. The resolution lost to floor (< 1 bit per bigram) is
  * irrelevant for a quality GATE, which compares documents, not
  * entropies.
  *
  * Scale shape: tokenize once (one corpus scan) → bigram occurrences
  * → the model is two map-side-combined counts (bigram c_ab, prefix
  * c_a) plus a one-row vocab aggregate (crossJoin broadcast — never
  * collected); scoring joins per-doc DISTINCT bigrams (occurrence
  * multiplicity pre-aggregated, so the join carries one row per
  * distinct (doc,a,b), not per token) against the model, both sides
  * hash-partitioned on (a,b); per-doc totals are one more
  * map-side-combined aggregate and the global top-20 is
  * TakeOrderedAndProject (20 rows per partition to the driver). Every
  * shuffle key is a word pair — the natural key at any corpus size.
  */
object LmSurprise {

  /** floor(log2(q)) for a positive integer column: bit length − 1. */
  private def floorLog2(q: Column): Column = length(conv(q, 10, 2)) - 1

  def textLmSurprise(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        filter(split(lower(col("text")), "\\s+"), t => length(t) > 0).as("t"))
      // tokenization feeds the vocab agg AND the bigram explode — cut
      // the lineage so the regex split runs once, not per consumer
      .localCheckpoint()

    // adjacent-token pairing zips the init-slice with the tail-slice
    // INSIDE the row — no posexplode+window, no per-doc shuffle
    val bg = toks
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("g"))
      .select(col("doc_id"), col("g.a").as("a"), col("g.b").as("b"))

    val vocab = toks.select(explode(col("t")).as("w"))
      .agg(count_distinct(col("w")).as("v"))

    val big = bg.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val uni = bg.groupBy("a").agg(count(lit(1)).as("c_a"))
    val model = big.join(uni, "a").crossJoin(broadcast(vocab))
      .select(col("a"), col("b"),
        floorLog2(call_function("div", col("c_a") + col("v"), col("c_ab") + lit(1)))
          .cast("long").as("sup"))

    val docbg = bg.groupBy("doc_id", "a", "b").agg(count(lit(1)).as("occ"))

    docbg.join(model, Seq("a", "b"))
      .groupBy("doc_id")
      .agg(sum(col("occ")).as("n_bigrams"),
        sum(col("occ") * col("sup")).as("total_surprise"))
      .select(col("doc_id"), col("n_bigrams"), col("total_surprise"),
        call_function("div", col("total_surprise") * lit(1000L), col("n_bigrams"))
          .as("mean_milli"))
      .orderBy(desc("mean_milli"), col("doc_id"))
      .limit(k)
  }

  /** DuckDB oracle — the identical exact-integer pipeline. */
  def oracleSql(k: Int = 20): String =
    s"""WITH tk AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t FROM documents
       |), p AS (
       |  SELECT doc_id, g['a'] AS a, g['b'] AS b FROM (
       |    SELECT doc_id, unnest([{'a': t[i], 'b': t[i+1]} FOR i IN generate_series(1, length(t) - 1)]) AS g FROM tk)
       |), v AS (
       |  SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM tk)
       |), big AS (
       |  SELECT a, b, count(*) AS c_ab FROM p GROUP BY 1, 2
       |), uni AS (
       |  SELECT a, count(*) AS c_a FROM p GROUP BY 1
       |), sup AS (
       |  SELECT big.a, big.b,
       |    length(printf('%b', (c_a + v) // (c_ab + 1))) - 1 AS sup
       |  FROM big JOIN uni ON big.a = uni.a CROSS JOIN v
       |), docbg AS (
       |  SELECT doc_id, a, b, count(*) AS occ FROM p GROUP BY 1, 2, 3
       |), per AS (
       |  SELECT doc_id, sum(occ) AS nb, sum(occ * sup) AS total
       |  FROM docbg JOIN sup USING (a, b) GROUP BY 1
       |)
       |SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams, CAST(total AS BIGINT) AS total_surprise,
       |  CAST((total * 1000) // nb AS BIGINT) AS mean_milli
       |FROM per ORDER BY mean_milli DESC, doc_id LIMIT $k""".stripMargin
}
