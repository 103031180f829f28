package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (SURVEY.md §2c) — the pipeline stage that
  * PRODUCES the merges table the engine's token counting
  * ([[TextOps.bpeishTokenCount]]) and sequence packing ([[SeqPack]])
  * consume: iterative byte-pair-encoding vocabulary fit (Sennrich et
  * al. 2016) run as K capped merge rounds over the corpus.
  *
  * Scale shape: classic BPE trains on the DISTINCT-WORD FREQUENCY
  * table, not the raw text — ONE corpus scan (regexp word extraction +
  * map-side-combined count) reduces 100 TB of text to a vocabulary
  * ∝ distinct words, and every merge round thereafter costs
  * O(vocab), never O(corpus): adjacent-pair counts are a
  * shuffle-aggregated explode over the word table, the argmax is a
  * TakeOrdered single row to the driver (bounded — the q_pagerank loop
  * discipline), and the merge applies as one column `replace`. Rounds
  * cut lineage per iteration (`localCheckpoint`), so K merges are K
  * bounded jobs, not one K-deep plan.
  *
  * Merge application is BOUNDARY-SAFE STRING REWRITING, identical in
  * any engine: a word [s₁,…,sₙ] is encoded `_s₁__s₂_…_sₙ_` (every
  * symbol wrapped in `_`, a character outside the [a-z] symbol
  * alphabet). Merging pair (l, r) is `replace(enc, "_l__r_", "_lr_")`:
  * the wrapper makes partial-symbol matches impossible (pair (a,b)
  * cannot fire inside [ab,c] or [a,bc]), and `replace`'s
  * left-to-right non-overlapping scan IS the BPE rule for runs
  * ([a,a,a] → [aa,a], one deterministic answer). The DuckDB oracle
  * unrolls the same K rounds as CTEs over the same encoding — exact
  * integer counts, total (count DESC, lhs, rhs) tie order, identical
  * `replace` semantics ⇒ hash-equal merge tables.
  *
  * Early exhaustion (every word a single symbol before K rounds) stops
  * the loop; the oracle's empty round-CTEs contribute zero rows
  * identically, so parity holds there too.
  */
object BpeTrain {

  /** Distinct-word frequency table of the documents corpus:
    * (enc = `_c__h__a__r_`-encoded word, cnt).
    */
  private[text] def wordTable(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), regexp_replace(col("w"), "(.)", "_$1_").as("enc"), col("cnt"))

  /** K BPE merge rounds over a (enc, cnt) word table → the ordered
    * merge list (rank, lhs, rhs, pairCount) on the driver — K values,
    * bounded by construction (the vocabulary itself stays distributed).
    */
  private[text] def trainMerges(words: DataFrame, k: Int): Seq[(Int, String, String, Long)] = {
    var cur = words.localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var exhausted = false
    var r = 1
    while (r <= k && !exhausted) {
      // adjacent symbol pairs weighted by word count; words of one
      // symbol contribute nothing (size guard — Spark's sequence()
      // would run DESCENDING on size-2 = -1, not empty)
      val best = cur
        .select(split(expr("btrim(enc, '_')"), "__").as("s"), col("cnt"))
        .filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(s)-2), i -> struct(s[i] AS lhs, s[i+1] AS rhs))")).as("p"))
        .groupBy(col("p.lhs"), col("p.rhs")).agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, rr, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, l, rr, n))
        cur = cur.select(
          call_function("replace", col("enc"),
            lit(s"_${l}__${rr}_"), lit(s"_$l$rr" + "_")).as("enc"),
          col("cnt"))
          .localCheckpoint()
        r += 1
      }
    }
    merges.toSeq
  }

  /** [[trainMerges]] as the `text_bpe_train` result frame. */
  private[text] def train(words: DataFrame, k: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    trainMerges(words, k).toDF("merge_rank", "lhs", "rhs", "n").orderBy("merge_rank")
  }

  /** Apply an ordered merge list to an encoded-word column: K stacked
    * literal `replace`s in ONE narrow projection — encoding with a
    * trained vocabulary is embarrassingly parallel (no shuffle, no
    * loop jobs; the sequential part of BPE is training, not encoding).
    */
  private[text] def applyMerges(words: DataFrame,
                                merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val enc = merges.foldLeft(col("enc")) { case (c, (_, l, r, _)) =>
      call_function("replace", c, lit(s"_${l}__${r}_"), lit(s"_$l$r" + "_"))
    }
    words.withColumn("enc", enc)
  }

  /** `text_bpe_train`: the first K=10 merges learned from the
    * documents corpus.
    */
  def textBpeTrain(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame =
    train(wordTable(spark, sfDir).select("enc", "cnt"), k)

  /** `text_bpe_encode` — the CONSUMING half of the tokenizer path:
    * train the K merges, apply them to the distinct-word vocabulary
    * (one shuffle-free projection, [[applyMerges]]), and re-join the
    * per-(doc, word) occurrence table to report each document's BPE
    * token count next to its word count — the compression a data
    * engineer checks before committing a vocabulary. Corpus shape at
    * scale: the vocab-side work is O(distinct words); the per-doc side
    * is one extract-explode + two map-side-combined aggregations and a
    * word-keyed join where the vocab side is the small one
    * (broadcastable far past any natural-language vocabulary).
    */
  def textBpeEncode(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val vocab = wordTable(spark, sfDir).localCheckpoint()
    val merges = trainMerges(vocab.select("enc", "cnt"), k)
    val wordTokens = applyMerges(vocab, merges)
      .select(col("w"),
        size(split(expr("btrim(enc, '_')"), "__")).cast("long").as("nt"))
    val docWords = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    docWords.join(wordTokens, "w")
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"), sum(col("c") * col("nt")).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** The shared K-round CTE chain (w0..wK, p/b per round), carrying
    * the original word `w` alongside its evolving encoding so both the
    * train and encode oracles read off one chain.
    */
  private def oracleChain(k: Int): String = {
    val rounds = (1 to k).map { r =>
      val prev = if (r == 1) "w0" else s"w${r - 1}"
      s"""p$r AS (
         |  SELECT s[i] AS lhs, s[i+1] AS rhs, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT string_split(trim(enc, '_'), '__') AS s, cnt FROM $prev),
         |       LATERAL (SELECT unnest(generate_series(1, len(s)-1)) AS i) t
         |  GROUP BY 1, 2),
         |b$r AS (SELECT lhs, rhs, n FROM p$r ORDER BY n DESC, lhs, rhs LIMIT 1),
         |w$r AS (SELECT w, replace(enc, '_'||lhs||'__'||rhs||'_', '_'||lhs||rhs||'_') AS enc, cnt
         |  FROM $prev, b$r)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       |  SELECT w, regexp_replace(w, '(.)', '_\\1_', 'g') AS enc, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
       |  GROUP BY w),
       |$rounds""".stripMargin
  }

  /** The matching DuckDB `text_bpe_train` oracle: K unrolled
    * merge-round CTEs over the identical encoding (same pair explode,
    * same argmax tie order, same `replace` application).
    */
  def oracleSql(k: Int = 10): String = {
    val union = (1 to k)
      .map(r => s"SELECT $r AS merge_rank, lhs, rhs, n FROM b$r")
      .mkString("\n  UNION ALL ")
    s"""WITH ${oracleChain(k)}
       |SELECT * FROM (
       |  $union
       |) ORDER BY merge_rank""".stripMargin
  }

  /** The `text_bpe_encode` oracle: the same chain's final vocabulary
    * (wK) re-joined to the per-(doc, word) occurrence table.
    */
  def oracleSqlEncode(k: Int = 10): String =
    s"""WITH ${oracleChain(k)},
       |wt AS (SELECT w, CAST(len(string_split(trim(enc, '_'), '__')) AS BIGINT) AS nt FROM w$k),
       |dw AS (
       |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
       |  GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
       |  CAST(sum(c * nt) AS BIGINT) AS n_bpe_tokens
       |FROM dw JOIN wt USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
