package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup.PlantOffset

/** PII detection + redaction over the `documents` table — the scrub
  * pass a training-data pipeline runs before anything else sees the
  * text (reference scope: SURVEY.md §2c text analysis; the reference
  * engine has no PII surface, this is part of the LLM-pipeline widening).
  *
  * Every detector is a codegen'd `regexp_count` / `regexp_replace` —
  * one pattern per category, no lambdas, no UDFs — so the scrub runs
  * inside whole-stage codegen over every document of a 100 TB corpus.
  * Patterns are RE2-compatible (no lookaround, no backreferences):
  * the DuckDB oracle runs the IDENTICAL pattern strings, so the Java
  * and RE2 engines must agree match-for-match, which restricts the
  * dialect to the common subset on purpose.
  *
  * Correctness contract ([[piiScrub]]): PII is PLANTED onto a copy of
  * the corpus by pure column arithmetic (id-derived emails / IPv4s /
  * phone numbers / SSN-likes appended at `doc_id + 3·PlantOffset`), so
  * the oracle can rebuild the exact planted corpus and recompute every
  * audit number independently. The audit pins, per category: match
  * count, matched-doc count, chars redacted, and the RESIDUAL count
  * after full redaction (must be zero — a pattern that misses its own
  * plant, or a replacement that re-creates a match, breaks the hash).
  */
object Pii {

  /** (category, RE2+Java-compatible pattern, replacement tag). Redaction
    * applies in THIS order; order matters only if one category's text
    * could overlap another's (they cannot here: the email local part
    * admits no `-`-separated digit groups, the tags contain no digits),
    * but a fixed order keeps Spark and the oracle bit-identical anyway.
    */
  val Categories: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("ipv4", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "<IP>"),
    ("phone", """\+1-\d{3}-\d{4}""", "<PHONE>"),
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", "<SSN>"))

  /** All-category sequential redaction of `c` — the library scrub. */
  def redactAll(c: Column): Column =
    Categories.foldLeft(c) { case (acc, (_, pat, tag)) =>
      regexp_replace(acc, lit(pat), lit(tag))
    }

  /** The scrubbed corpus itself: every document, PII replaced by tags. */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol, redactAll(col(textCol)))

  // ---------------------------------------------------- planted corpus

  /** The id-derived PII payload appended to planted docs. Which
    * category lands on a doc cycles with `doc_id % 4`; every payload
    * embeds id-derived digits (lpad'd where width matters) so a
    * detector that truncates, anchors wrong, or drops leading zeros
    * misses SOME plant and fails loudly. Shared by the batch and
    * streaming planting paths.
    */
  def plantPayload(docId: Column): Column =
    when(docId % 4 === 0,
      concat(lit(" contact user"), docId.cast("string"), lit("@example.com")))
      .when(docId % 4 === 1,
        concat(lit(" from 10."), (docId % 200).cast("string"), lit("."),
          ((docId / 7).cast("long") % 200).cast("string"), lit("."),
          (docId % 250).cast("string")))
      .when(docId % 4 === 2,
        concat(lit(" call +1-555-"), lpad((docId % 10000).cast("string"), 4, "0")))
      .otherwise(
        concat(lit(" ssn "), lpad((docId % 900 + 100).cast("string"), 3, "0"),
          lit("-"), lpad((docId % 90 + 10).cast("string"), 2, "0"),
          lit("-"), lpad((docId % 9000 + 1000).cast("string"), 4, "0")))

  /** Corpus + one PII-bearing copy of every 5th document at
    * `doc_id + 3·PlantOffset` (see [[plantPayload]]).
    */
  def plantedPiiDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.dedup.NearDup.guardIds(d, "doc_id")
    d.select(col("doc_id"), col("text"))
      .unionByName(
        d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 3 * PlantOffset).as("doc_id"),
            concat(col("text"), plantPayload(col("doc_id"))).as("text")))
  }

  /** STREAM-safe planting: one input row explodes into (original,
    * conditional planted copy) — equivalent rows to [[plantedPiiDocs]]'
    * union, but a single stateless projection, so it composes with a
    * streaming source (a self-union of one file stream would read the
    * input twice and double the source bookkeeping).
    */
  def plantedPiiRows(docs: DataFrame): DataFrame =
    docs.select(explode(array(
      struct(col("doc_id"), col("text")),
      // the synthetic slot is discarded by doc_id (not text): filtering
      // on text would also drop ORIGINAL rows with null text, diverging
      // from plantedPiiDocs' batch union, which keeps them
      struct(when(col("doc_id") % 5 === 0, col("doc_id") + 3 * PlantOffset).as("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), plantPayload(col("doc_id")))).as("text"))))
      .as("r"))
      .select("r.*")
      .filter(col("doc_id").isNotNull)

  // ------------------------------------------------------- audit query

  /** Stateless per-document audit projection: per-category match
    * counts, redaction deltas, and the fully-redacted text — ONE scan,
    * no shuffle, safe on a streaming frame.
    */
  def perDocAudit(planted: DataFrame): DataFrame =
    planted.select(
      Categories.flatMap { case (cat, pat, tag) =>
        Seq(
          regexp_count(col("text"), lit(pat)).cast("long").as(s"m_$cat"),
          (length(col("text")) - length(regexp_replace(col("text"), lit(pat), lit(tag))))
            .cast("long").as(s"d_$cat"))
      } :+ redactAll(col("text")).as("red"): _*)

  /** Rollup of [[perDocAudit]] rows to the 4-row per-category audit
    * (aggregated once, then pivoted long driver-side — a 1-row → 4-row
    * explode, not a shuffle).
    */
  def auditRollup(projected: DataFrame): DataFrame = {
    val aggCols: Seq[Column] = Categories.flatMap { case (cat, pat, _) =>
      Seq(
        sum(col(s"m_$cat")).as(s"nm_$cat"),
        sum(when(col(s"m_$cat") > 0, 1L).otherwise(0L)).as(s"nd_$cat"),
        sum(col(s"d_$cat")).as(s"nc_$cat"),
        sum(regexp_count(col("red"), lit(pat)).cast("long")).as(s"nr_$cat"))
    }
    val agged = projected.agg(aggCols.head, aggCols.tail: _*)
    agged.select(explode(array(Categories.map { case (cat, _, _) =>
      struct(lit(cat).as("category"),
        col(s"nm_$cat").as("n_matches"),
        col(s"nd_$cat").as("n_docs"),
        col(s"nc_$cat").as("n_chars_redacted"),
        col(s"nr_$cat").as("n_residual"))
    }: _*)).as("r"))
      .select("r.*")
      .orderBy("category")
  }

  /** Per-category scrub audit over the planted corpus. */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame =
    auditRollup(perDocAudit(plantedPiiDocs(spark, sfDir)))
}
