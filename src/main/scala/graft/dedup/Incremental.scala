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
  * Jaccard verify touches only the (tiny) cross-candidate set.
  *
  * Two variants ship:
  *   - [[incrementalClassify]] (`dedup_incremental`) is self-contained:
  *     it re-derives snapshot signatures per run — fine for a one-off,
  *     O(corpus) per drop.
  *   - [[incrementalClassifyIndexed]] (`dedup_incremental_indexed`) is
  *     the production day-2 shape: [[writeSnapshotIndex]] persists the
  *     snapshot's content hashes, capped LSH band buckets and shingle
  *     sets ONCE as parquet; each drop then reads the index and
  *     computes text-derived anything for the BATCH ONLY — snapshot
  *     text is never re-read, never re-shingled (a spec scan-audits the
  *     per-drop plan for exactly that), so per-drop cost is
  *     O(batch + matched candidates), the difference between a nightly
  *     job that takes minutes and one that re-reads 100 TB.
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
    // checkpointed (round-15, guide §5): three consumers (the exact
    // semi-join, the LSH union, the final census) each re-ran the
    // batch construction — a 3-way union whose truncate/reverse HOFs
    // are interpreted per token. The batch is the SMALL side by the
    // operator's own asymmetry, so materializing it is bounded.
    val batch = newBatch(spark, sfDir).localCheckpoint(eager = false)
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

  // --------------------------------------- persisted-snapshot variant

  /** One-time snapshot index build — the amortization that makes day-2
    * dedup O(batch). Three parquet tables under `indexDir`:
    *   - `hashes`:   (doc_id, h) content md5, for exact membership
    *   - `bands`:    (doc_id, band, bucket) LSH buckets, oversized
    *                 buckets dropped AT BUILD TIME (the cap decision is
    *                 made once, against the full snapshot)
    *   - `shingles`: (doc_id, sh) shingle sets, so exact-Jaccard verify
    *                 of a candidate never touches snapshot text
    * In production this runs once per snapshot compaction; every crawl
    * drop reads it. Rebuilding on snapshot growth is append-shaped
    * (new docs' rows only) — the tables are keyed by doc_id.
    */
  def writeSnapshotIndex(old: DataFrame, indexDir: String,
                         shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                         bucketCap: Int = 10000): Unit = {
    old.select(col("doc_id"), md5(col("text")).as("h"))
      .write.mode("overwrite").parquet(s"$indexDir/hashes")
    // shingle ONCE: the written shingles table is also the signature
    // input (identical arrays), so the snapshot text is tokenized once
    // per index build instead of once per output table (round-14;
    // guide §1.2 — remove redundant passes)
    Dedup.shingleSets(old, shingleN)
      .write.mode("overwrite").parquet(s"$indexDir/shingles")
    val sigs = Dedup.minhashSignaturesFromShingleSets(
      old.sparkSession.read.parquet(s"$indexDir/shingles"), bands * rowsPerBand)
    Dedup.capBuckets(Dedup.bandBuckets(sigs, bands, rowsPerBand),
        Seq("band", "bucket"), bucketCap)
      .write.mode("overwrite").parquet(s"$indexDir/bands")
  }

  /** Per-drop classification against a PERSISTED snapshot index. Every
    * text-derived computation here runs over the batch only; the
    * snapshot contributes pre-computed parquet rows. Cross pairs are
    * structural (snapshot bands ⋈ batch bands), so no id-space filter
    * is needed to exclude snapshot self-pairs.
    */
  def classifyAgainstIndex(spark: SparkSession, batch: DataFrame, indexDir: String,
                           shingleN: Int = 3, bands: Int = 16,
                           rowsPerBand: Int = 4): DataFrame = {
    val exactIds = batch
      .withColumn("h", md5(col("text")))
      .join(spark.read.parquet(s"$indexDir/hashes").select("h"), Seq("h"), "left_semi")
      .select(col("doc_id"))
    // shingle the batch ONCE (round-15 — the writeSnapshotIndex pattern
    // applied to the per-drop side): the checkpointed shingle table
    // feeds both the signature/band derivation and the exact-Jaccard
    // verify join, instead of tokenizing the batch text twice.
    val batchGrams = Dedup.shingleSets(batch, shingleN).localCheckpoint(eager = false)
    val batchBands = Dedup.bandBuckets(
      Dedup.minhashSignaturesFromShingleSets(batchGrams, bands * rowsPerBand),
      bands, rowsPerBand)
    val cand = spark.read.parquet(s"$indexDir/bands")
      .select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      .join(batchBands.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
        Seq("band", "bucket"))
      .select("id_a", "id_b")
      .distinct()
    val nearIds = cand
      .join(spark.read.parquet(s"$indexDir/shingles")
        .select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(batchGrams
        .select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= NearThreshold)
      .select(col("id_b").as("doc_id"))
      .distinct()
    batch.select("doc_id")
      .join(exactIds.withColumn("is_exact", lit(1)), Seq("doc_id"), "left")
      .join(nearIds.withColumn("is_near", lit(1)), Seq("doc_id"), "left")
      .select(
        when(col("is_exact") === 1, "exact_dup")
          .when(col("is_near") === 1, "near_dup")
          .otherwise("novel").as("category"))
      .groupBy("category").agg(count(lit(1)).as("n_docs"))
      .orderBy("category")
  }

  /** `dedup_incremental_indexed`: build the snapshot index (the
    * once-per-snapshot cost, paid here so the query is self-contained),
    * then classify the same synthetic drop through the per-drop path.
    * Same census, same oracle as `dedup_incremental` — the contract is
    * that the indexed path loses nothing.
    */
  def incrementalClassifyIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    val indexDir = graft.util.TempDirs.forInput(sfDir, "snapidx")
    val old = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    writeSnapshotIndex(old, indexDir)
    // checkpointed for the same reason as incrementalClassify: four
    // consumers (hash semi-join, signatures, shingle verify, census)
    // would otherwise each re-run the batch construction.
    classifyAgainstIndex(spark, newBatch(spark, sfDir).localCheckpoint(eager = false), indexDir)
  }
}
