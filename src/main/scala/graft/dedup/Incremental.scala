package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (continual-crawl) dedup — classify a NEW ingestion batch
  * against an EXISTING corpus snapshot: every new document is either an
  * exact duplicate of the snapshot, a near duplicate, or novel. This is
  * the asymmetric shape a production pipeline runs on every crawl drop;
  * the batch-vs-batch operators ([[Dedup.exact]], the near-dup
  * pipelines) cover the initial backfill, this covers day 2.
  *
  * Scale shape: the batch is orders of magnitude smaller than the
  * snapshot. Exact membership is a LEFT SEMI join on the content hash
  * (shuffles only hashes). Near membership reuses the banded-LSH
  * candidate machinery ([[Dedup.minhashCandidatesOf]]) over
  * snapshot ∪ batch, then keeps CROSS pairs only — the snapshot side
  * never pairs with itself, candidate ids travel alone, and the exact
  * Jaccard verify touches only the (tiny) cross-candidate set. At
  * 100 TB the snapshot's signatures/bands would be precomputed once
  * and persisted; the per-drop cost is then proportional to the batch.
  *
  * Contract ([[incrementalClassify]], `dedup_incremental`): the batch
  * is built from the snapshot itself by pure arithmetic —
  *   - `doc_id % 8 == 0` → verbatim copy            → exact_dup
  *   - `doc_id % 8 == 1` (≥ 60 tokens) → 90% token-prefix truncation
  *     (word-3-gram Jaccard ≈ 0.90 vs its source)   → near_dup
  *   - `doc_id % 8 == 2` (≥ 3 tokens) → token-REVERSED text + an
  *     id-derived nonce token (reversal destroys every shingle, the
  *     nonce kills accidental exactness)            → novel
  * so the oracle recomputes the three class counts from the same
  * predicates. A missed band collision, a hash-set false negative, or
  * a precedence bug shifts a count and breaks the hash.
  */
object Incremental {

  val BatchOffset: Long = 7 * Dedup.PlantOffset
  val NearThreshold = 0.85

  /** The synthetic "new crawl drop" derived from the snapshot. */
  def newBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    NearDup.guardIds(d, "doc_id")
    val toks = Dedup.tokens(col("text"))
    d.filter(col("doc_id") % 8 === 0)
      .select((col("doc_id") + BatchOffset).as("doc_id"), lower(col("text")).as("text"))
      .unionByName(
        d.filter(col("doc_id") % 8 === 1 &&
            regexp_count(col("text"), lit("\\S+")) >= 60)
          .select((col("doc_id") + BatchOffset).as("doc_id"),
            NearDup.truncateTokens(col("text"), 0.9).as("text")))
      .unionByName(
        d.filter(col("doc_id") % 8 === 2 && size(toks) >= 3)
          .select((col("doc_id") + BatchOffset).as("doc_id"),
            concat(concat_ws(" ", reverse(toks)),
              lit(" zq"), col("doc_id").cast("string"), lit("v")).as("text")))
  }

  /** Per-category classification census of the batch vs the snapshot. */
  def incrementalClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val old = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val batch = newBatch(spark, sfDir)
    // exact membership: content-hash semi join against the snapshot
    val exactIds = batch
      .withColumn("h", md5(col("text")))
      .join(old.select(md5(col("text")).as("h")), Seq("h"), "left_semi")
      .select(col("doc_id"))
    // near membership: banded LSH over snapshot ∪ batch, cross pairs
    // only, exact-Jaccard verified
    val nearIds = Dedup.minhashCandidatesOf(old.unionByName(batch))
      .filter(col("id_a") < Dedup.PlantOffset && col("id_b") >= BatchOffset &&
        col("jaccard") >= NearThreshold)
      .select(col("id_b").as("doc_id"))
      .distinct()
    val classified = batch.select("doc_id")
      .join(exactIds.withColumn("is_exact", lit(1)), Seq("doc_id"), "left")
      .join(nearIds.withColumn("is_near", lit(1)), Seq("doc_id"), "left")
      .select(
        when(col("is_exact") === 1, "exact_dup")
          .when(col("is_near") === 1, "near_dup")
          .otherwise("novel").as("category"))
    classified.groupBy("category").agg(count(lit(1)).as("n_docs"))
      .orderBy("category")
  }
}
