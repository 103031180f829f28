package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Character-entropy quality gate (SURVEY.md §2c) — the low-entropy
  * filter of a curation pipeline: boilerplate, padded, and
  * single-character-flood documents have character distributions far
  * from the corpus norm, and an entropy floor is the classic cheap
  * gate next to the repetition (31f) and rare-token (31g) signals.
  *
  * Exactness: true Shannon entropy needs log2 of arbitrary rationals
  * (libm — cross-engine float drift), so the engine scores the exact
  * INTEGER lower bound used by `text_lm_surprise`:
  *   bits_floor = Σ_chars c_i · (bitlen(n div c_i) − 1)
  *             = Σ c_i · floor(log2(n / c_i))          (exact identity:
  * floor(log2 x) = floor(log2 floor(x)) for x ≥ 1, since the powers of
  * two are integers). n·H is within [bits_floor, bits_floor + n), and
  * the bound itself is deterministic integer arithmetic — bit-identical
  * in any engine, no tolerance band. Score per doc in whole bits plus
  * the per-character milli-bit floor `(1000·bits_floor) div n`.
  *
  * Flag contract: docs below `minMilliBits` per char are flagged; the
  * corpus plants none that low naturally EXCEPT degenerate ones — the
  * spec plants a single-char flood and pins its flag.
  *
  * Scale shape: one projection explodes text into characters (the
  * token-explode shape every 31x op uses — rows ∝ corpus chars, the
  * irreducible input size), two map-side-combined groupBys ((doc, ch)
  * then doc), one broadcast-size join of per-doc totals. No window,
  * no sort, no driver data.
  */
object Entropy {

  private def floorLog2(q: Column): Column = length(conv(q, 10, 2)) - 1

  def textEntropy(spark: SparkSession, sfDir: String,
                  minMilliBits: Long = 1500L): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val chars = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
    val counts = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("doc_id").agg(sum("c").as("n"))
    counts.join(totals, "doc_id")
      .groupBy("doc_id")
      .agg(
        first("n").as("n_chars"),
        sum(col("c") * floorLog2(call_function("div", col("n"), col("c"))))
          .as("bits_floor"))
      .select(
        col("doc_id"), col("n_chars"), col("bits_floor"),
        call_function("div", col("bits_floor") * lit(1000L), col("n_chars"))
          .as("millibits_per_char"))
      .withColumn("low_entropy", col("millibits_per_char") < minMilliBits)
      .orderBy("doc_id")
  }

  /** Same integer identity in DuckDB — bitlen via printf('%b'). */
  def oracleSql(minMilliBits: Long = 1500L): String =
    s"""WITH chars AS (
       |  SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
       |  FROM documents
       |), counts AS (
       |  SELECT doc_id, ch, count(*) AS c FROM chars
       |  WHERE ch <> '' GROUP BY 1, 2
       |), totals AS (
       |  SELECT doc_id, sum(c) AS n FROM counts GROUP BY 1
       |), scored AS (
       |  SELECT counts.doc_id,
       |    CAST(max(n) AS BIGINT) AS n_chars,
       |    CAST(sum(c * (length(printf('%b', CAST(n // c AS BIGINT))) - 1)) AS BIGINT) AS bits_floor
       |  FROM counts JOIN totals ON counts.doc_id = totals.doc_id
       |  GROUP BY 1
       |)
       |SELECT doc_id, n_chars, bits_floor,
       |  CAST((1000 * bits_floor) // n_chars AS BIGINT) AS millibits_per_char,
       |  CAST((1000 * bits_floor) // n_chars < $minMilliBits AS BOOLEAN) AS low_entropy
       |FROM scored ORDER BY doc_id""".stripMargin
}
