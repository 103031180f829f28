package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Vocabulary-statistics quality scoring — the OOV/rare-token filter of
  * published corpus recipes: a document full of tokens the rest of the
  * corpus never uses is noise (mojibake, id dumps, boilerplate keys).
  * Unlike [[TextOps.qualityScores]] (per-doc-local signals), this is a
  * TWO-PASS shape: corpus-wide token statistics first, then every
  * document scored against them.
  *
  * Scale shape: pass 1 is a map-side-combined token groupBy. The rare
  * (tf ≤ 2) subset is NOT broadcast: Zipf's law makes hapax/rare
  * tokens the LARGEST slice of a natural vocabulary (roughly half of
  * all distinct tokens — billions of entries at 100 TB), so the score
  * semi-join shuffles on token. AQE is free to downgrade that to a
  * broadcast at small scale where the measured rare set is tiny; the
  * operator must not force it. Scoring
  * aggregates back to (doc) then (lang) with partial aggregation
  * throughout. All signals are exact integers — deliberately NO
  * perplexity-style log-sums: `log10` is not correctly-rounded IEEE,
  * so JVM vs libm could differ in the last ulp and break cross-engine
  * verification; rare-token counts carry the same signal decision-wise.
  *
  * Contract: every 25th doc gets a copy at `doc_id + 6·PlantOffset`
  * with id-derived NONCE tokens appended (corpus frequency exactly 1 —
  * guaranteed rare). Planted docs must all be flagged; the natural
  * word-soup corpus (tiny vocabulary, every token frequent) must show
  * zero rare hits outside the plants' own nonces.
  */
object RareTokens {

  /** Tokens with corpus frequency ≤ this are "rare". */
  val RareMax = 2L

  /** A doc is flagged when it has ≥ this many rare tokens. */
  val FlagMin = 2L

  /** Corpus + nonce-bearing copies: ` xq<id>za xq<id>zb` appends two
    * unique-in-corpus tokens (each frequency 1) to every 25th doc.
    */
  def plantedRareDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.dedup.NearDup.guardIds(d, "doc_id")
    d.select(col("doc_id"), col("lang"), lower(col("text")).as("text"))
      .unionByName(
        d.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 6 * Dedup.PlantOffset).as("doc_id"), col("lang"),
            concat(lower(col("text")),
              lit(" xq"), col("doc_id").cast("string"), lit("za"),
              lit(" xq"), col("doc_id").cast("string"), lit("zb")).as("text")))
  }

  /** Per-language rare-token audit over the planted corpus. */
  def rareTokenStats(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = plantedRareDocs(spark, sfDir)
      .select(col("doc_id"), col("lang"), explode(Dedup.tokens(col("text"))).as("tok"))
    // pass 1: corpus vocabulary counts (map-side combined)
    val rare = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      .filter(col("tf") <= RareMax)
      .select("tok")
    // pass 2: score docs against the rare set. No broadcast hint — by
    // Zipf's law the tf ≤ RareMax set is the largest part of the
    // vocabulary at corpus scale, so this semi-join must shuffle on
    // token (AQE may still broadcast at runtime when the measured set
    // is genuinely small). Per-doc rare counts, then the lang rollup.
    val perDoc = toks
      .join(rare, Seq("tok"), "left_semi")
      .groupBy("doc_id", "lang").agg(count(lit(1)).as("n_rare"))
    val docs = plantedRareDocs(spark, sfDir).select("doc_id", "lang")
    docs.join(perDoc, Seq("doc_id", "lang"), "left")
      .select(col("lang"), coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_rare").as("rare_occurrences"),
        sum(when(col("n_rare") >= FlagMin, 1L).otherwise(0L)).as("n_docs_flagged"))
      .orderBy("lang")
  }
}
