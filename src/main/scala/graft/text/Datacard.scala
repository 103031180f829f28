package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus DATA CARD (SURVEY.md §2c) — the one-page release summary
  * every published dataset ships (what a reader of a dataset card's
  * "composition" table sees): per predicted language, the document /
  * character / token volumes, the exact-duplicate mass, and the
  * punctuation/digit density. This is deliberately a COMPOSITION row:
  * every signal reuses a formula an existing oracle row already pins
  * cross-engine ([[TextOps.wsTokenCount]] / [[TextOps.bpeishTokenCount]]
  * / [[TextOps.langPredCol]] / the `text_quality` punct class / the
  * `dedup_exact` md5(lower(text)) key), so the card is the pipeline's
  * building blocks composed, not new semantics.
  *
  * Scale shape: ONE corpus scan computes all per-doc signals (codegen'd
  * regexp counts — the signal projection is `localCheckpoint`ed because
  * TWO aggregations consume it; without the cut the regex pass runs
  * twice); then two map-side-combined aggregations — by language
  * (|langs|+1 rows) and by text hash (|distinct texts| rows, carrying
  * only the hash + counts, never the texts) — and a |langs|-row join.
  * Densities are EXACT integer permille ((1000·Σ) div Σchars — headroom
  * to ~9·10¹⁵ punctuation chars, comfortably past 100 TB of text).
  */
object Datacard {

  /** ONE corpus scan computing every per-doc signal (plus doc_id, so
    * the near-dup composition can attribute cluster mass by language
    * without a second regex pass); localCheckpoint'ed because at least
    * two aggregations consume it.
    */
  private[text] def signals(docs: DataFrame): DataFrame =
    docs.select(
      Seq(
        col("doc_id"),
        md5(lower(col("text"))).as("h"), // the dedup_exact key
        length(col("text")).cast("long").as("chars"),
        TextOps.wsTokenCount(col("text")).cast("long").as("wst"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("bpt"),
        regexp_count(col("text"), lit(TextOps.PunctClass)).cast("long").as("punct"),
        regexp_count(col("text"), lit("[0-9]")).cast("long").as("digits")
      ) ++ TextOps.langScoreCols(col("text")): _*)
      .withColumn("pred", TextOps.langPredCol)
      .localCheckpoint()

  /** The card over an arbitrary (doc_id, text) frame — spec-plantable. */
  private[text] def card(docs: DataFrame): DataFrame = cardFrom(signals(docs))

  private def cardFrom(sig: DataFrame): DataFrame = {
    val vol = sig.groupBy("pred").agg(
      count(lit(1)).as("n_docs"),
      sum("chars").as("n_chars"),
      sum("wst").as("n_ws_tokens"),
      sum("bpt").as("n_bpeish_tokens"),
      expr("(1000 * sum(punct)) div greatest(sum(chars), 1)").as("punct_permille"),
      expr("(1000 * sum(digits)) div greatest(sum(chars), 1)").as("digit_permille"))
    // duplicate mass: docs participating in an exact-duplicate group;
    // pred is a pure function of text, so every h-group has ONE pred
    // (min() is a determinism belt, not a choice)
    val dup = sig.groupBy("h")
      .agg(min("pred").as("pred"), count(lit(1)).as("hc"))
      .groupBy("pred")
      .agg(sum(when(col("hc") > 1, col("hc")).otherwise(0L)).as("n_dup_docs"))
    vol.join(dup, "pred")
      .select("pred", "n_docs", "n_chars", "n_ws_tokens", "n_bpeish_tokens",
        "n_dup_docs", "punct_permille", "digit_permille")
      .orderBy("pred")
  }

  def corpusDatacard(spark: SparkSession, sfDir: String): DataFrame =
    card(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** The card extended with NEAR-duplicate mass (round-10 verdict item
    * 6): real release cards report near-dup rates next to exact-dup
    * mass, and the column here comes from the engine's ACTUAL near-dup
    * pipeline — [[graft.dedup.Cluster.nearDupSurvivors]] (minhash-LSH
    * candidates → Jaccard-verified pairs → connected components) over
    * the planted-chain corpus — not from a second definition. Mass =
    * Σ cluster size over clusters of size > 1, attributed to the
    * KEEPER's predicted language (the keeper is the min-id base doc by
    * the chain construction; a clustering that splits a chain loses the
    * root join and the oracle breaks — the pin rides the same planted
    * arithmetic as `dedup_near_survivors`).
    *
    * Scale shape: the card signals stay ONE corpus scan (shared
    * localCheckpoint'ed projection, reused for the volume census, the
    * exact-dup census, and the keeper-language attribution); the
    * near-dup pipeline is the already-scale-audited clustering; the
    * composition adds one |clusters|-row aggregate and one |langs|-row
    * join.
    */
  def corpusDatacardNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    // the signal scan (eager localCheckpoint) and the clustering
    // pipeline's eager internals are independent until the attribution
    // join — concurrent jobs (guide §2.6), computations unchanged
    val (sig, manifest) = graft.util.Par.par2(
      signals(spark.read.parquet(s"$sfDir/documents.parquet")),
      graft.dedup.Cluster.nearDupSurvivors(spark, sfDir))
    val nd = manifest.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
      .filter(col("csize") > 1)
      .join(sig.select(col("doc_id"), col("pred")),
        col("cluster_id") === col("doc_id"))
      .groupBy("pred").agg(sum("csize").as("n_neardup_docs"))
    cardFrom(sig)
      .join(nd, Seq("pred"), "left")
      .na.fill(0L, Seq("n_neardup_docs"))
      .select("pred", "n_docs", "n_chars", "n_ws_tokens", "n_bpeish_tokens",
        "n_dup_docs", "n_neardup_docs", "punct_permille", "digit_permille")
      .orderBy("pred")
  }

  /** The identical card in DuckDB — every sub-formula copied verbatim
    * from the oracle row that already pins it (`text_langid` scores +
    * CASE chain, `text_tokens` counts, `text_quality` punct class,
    * `dedup_exact` hash key).
    */
  /** The shared card CTE stem (sig → langid scores → prediction →
    * volumes → exact-dup mass), composed — not string-patched — into
    * both oracles below; `keepDocId` threads doc_id through for the
    * near-dup join.
    */
  private def cardCtes(keepDocId: Boolean): String = {
    val docId = if (keepDocId) "doc_id, " else ""
    raw"""WITH sig AS (
      |  SELECT ${docId}md5(lower(text)) AS h,
      |    CAST(length(text) AS BIGINT) AS chars,
      |    CAST(length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS wst,
      |    CAST(length(regexp_extract_all(text, '[A-Za-z]+')) + length(regexp_extract_all(text, '[0-9]+')) + length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS bpt,
      |    CAST(length(regexp_extract_all(text, '[!"#$$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]')) AS BIGINT) AS punct,
      |    CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digits,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT *, length(list_filter(toks, x -> x IN ('the', 'and', 'of', 'with'))) AS s_en,
      |    length(list_filter(toks, x -> x IN ('el', 'la', 'los', 'de'))) AS s_es,
      |    length(list_filter(toks, x -> x IN ('der', 'die', 'und', 'das'))) AS s_de,
      |    length(list_filter(toks, x -> x IN ('le', 'la', 'les', 'des'))) AS s_fr,
      |    length(list_filter(toks, x -> x IN ('的', '了', '是', '在'))) AS s_zh
      |  FROM sig),
      |p AS (SELECT *, CASE
      |  WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'unknown'
      |  WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
      |  WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
      |  WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
      |  WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
      |  ELSE 'zh' END AS pred FROM s),
      |vol AS (
      |  SELECT pred, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(chars) AS BIGINT) AS n_chars,
      |    CAST(sum(wst) AS BIGINT) AS n_ws_tokens,
      |    CAST(sum(bpt) AS BIGINT) AS n_bpeish_tokens,
      |    CAST((1000 * sum(punct)) // greatest(sum(chars), 1) AS BIGINT) AS punct_permille,
      |    CAST((1000 * sum(digits)) // greatest(sum(chars), 1) AS BIGINT) AS digit_permille
      |  FROM p GROUP BY 1),
      |byh AS (SELECT min(pred) AS pred, count(*) AS hc FROM p GROUP BY h),
      |dup AS (SELECT pred, CAST(sum(CASE WHEN hc > 1 THEN hc ELSE 0 END) AS BIGINT) AS n_dup_docs
      |  FROM byh GROUP BY 1)""".stripMargin
  }

  val oracleSql: String = cardCtes(keepDocId = false) + "\n" +
    """SELECT pred, n_docs, n_chars, n_ws_tokens, n_bpeish_tokens, n_dup_docs,
      |  punct_permille, digit_permille
      |FROM vol JOIN dup USING (pred) ORDER BY pred""".stripMargin

  /** The near-dup card's oracle: the SAME card CTEs (with doc_id kept
    * through sig) plus the planted-chain arithmetic that
    * `dedup_near_survivors` pins — each eligible doc (even id, ≥ 60
    * tokens) roots a cluster {a, a+1M, a+2M} of size 3, so near-dup
    * mass per language = 3 × |eligible docs predicted that language|.
    * The engine's number comes from the REAL clustering; agreement
    * means LSH found every chain and invented none.
    */
  val oracleSqlNearDup: String = {
    cardCtes(keepDocId = true) + ",\n" +
      """elig AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id % 2 = 0 AND length(regexp_extract_all(text, '\S+')) >= 60),
        |nd AS (
        |  SELECT p.pred, CAST(3 * count(*) AS BIGINT) AS n_neardup_docs
        |  FROM elig e JOIN p ON p.doc_id = e.doc_id GROUP BY 1)
        |SELECT pred, n_docs, n_chars, n_ws_tokens, n_bpeish_tokens, n_dup_docs,
        |  CAST(COALESCE(nd.n_neardup_docs, 0) AS BIGINT) AS n_neardup_docs,
        |  punct_permille, digit_permille
        |FROM vol JOIN dup USING (pred) LEFT JOIN nd USING (pred)
        |ORDER BY pred""".stripMargin
  }
}
