package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training SEQUENCE PACKING (SURVEY.md §2c) — the GPT-style
  * pretraining batch layout: the corpus is one concatenated token
  * stream in doc_id order, cut into fixed-`capacity` sequences;
  * a document occupies the half-open token interval
  * [start, start+nt) and therefore spans sequences
  * `start div cap .. (start+nt−1) div cap` — long documents SPLIT
  * across sequence boundaries (the part `corpus_pack`'s whole-doc
  * shard packing deliberately does not do). Sequence count is exactly
  * ⌈Σtokens/cap⌉ by construction — zero padding waste except the tail.
  *
  * Scale shape — DISTRIBUTED PREFIX SUM, two levels: a global running
  * token offset is inherently sequential, so it is computed as
  * (1) per-bucket token totals (one map-side-combined aggregate;
  * bucket = doc_id div bucketSize preserves the stream order as
  * contiguous ranges), cumulated by a window over the |buckets|-row
  * totals — the rate-spike discipline: a single-partition window whose
  * input is bounded BY CONSTRUCTION: bucketSize defaults to
  * ⌈√(maxDocId+1)⌉ (one cheap aggregate over the already-checkpointed
  * 3-column frame), so BOTH levels are ≈ √n at any corpus size —
  * level 1 sees ≈ √n bucket rows, each bucket holds ≈ √n docs
  * (recurse the same two-level scheme past ~10¹² docs); then (2) an
  * intra-bucket cumsum windowed PER BUCKET — fully parallel. Every
  * quantity is exact integer arithmetic (`div` floors on positives
  * identically in any engine); the DuckDB oracle computes the same
  * offsets with its naive single global window — different plan, same
  * stream.
  *
  * Output: the per-doc span-count histogram (n_spans, n_docs,
  * n_tokens) — the number a data engineer actually checks before
  * training ("how many documents get cut, how badly").
  */
object SeqPack {

  /** √n bucket width for a dense id space [0, maxIdPlus1): makes the
    * level-1 window input and the per-bucket cumsum BOTH ≈ √n rows.
    */
  private[text] def autoBucketSize(maxIdPlus1: Long): Long =
    math.max(1L, math.ceil(math.sqrt(math.max(1L, maxIdPlus1).toDouble)).toLong)

  /** Per-doc stream offsets via the two-level distributed prefix sum:
    * (doc_id, nt, start) — the shared core of the histogram and the
    * manifest. `bucketSize <= 0` (the default) auto-sizes to
    * [[autoBucketSize]] of the corpus's max doc_id.
    */
  private[text] def perDocStarts(spark: SparkSession, sfDir: String,
                                 bucketSize: Long): DataFrame = {
    // localCheckpoint: the (doc_id, nt) frame feeds the auto-size
    // aggregate, the bucket-total aggregate, AND the per-doc join —
    // without the cut the regex tokenization scans the corpus text
    // once per consumer (measured ~2× at sf1); checkpointed it is two
    // 8-byte columns read three times.
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("nt"))
      .filter(col("nt") > 0)
      .localCheckpoint()
    val bs =
      if (bucketSize > 0) bucketSize
      else {
        val m = base.agg(max("doc_id")).head()
        autoBucketSize(if (m.isNullAt(0)) 1L else m.getLong(0) + 1L)
      }
    val toks = base.withColumn("bucket", expr(s"doc_id div ${bs}L"))
    // level 1: |buckets|-row totals; strict-prefix cumsum so a bucket's
    // own tokens are not included in its offset
    val bucketPrefix = toks.groupBy("bucket").agg(sum("nt").as("bt"))
      .withColumn("bpre", coalesce(
        sum("bt").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "bpre")
    // level 2: intra-bucket strict-prefix cumsum — parallel per bucket
    val intra = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .join(bucketPrefix, "bucket")
      .withColumn("start", col("bpre") + coalesce(sum("nt").over(intra), lit(0L)))
      .select("doc_id", "nt", "start")
  }

  def corpusSeqPack(spark: SparkSession, sfDir: String,
                    capacity: Int = 64, bucketSize: Long = 0L): DataFrame =
    perDocStarts(spark, sfDir, bucketSize)
      .withColumn("n_spans",
        expr(s"(start + nt - 1) div ${capacity}L") - expr(s"start div ${capacity}L") + 1)
      .groupBy("n_spans")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
      .orderBy("n_spans")

  /** The dataloader-consumable ASSIGNMENT MANIFEST
    * (`corpus_seqpack_manifest`): one row per (document, sequence)
    * span — the sequence id, the token offset INSIDE the document, and
    * the span length. A loader materializes sequence s by
    * concatenating s's spans in doc_id order; a document's spans are
    * contiguous (each `off_in_doc` resumes where the previous span
    * ended) and sum to its token count, and every sequence except the
    * last sums exactly to `capacity` — all three reassembly invariants
    * spec-pinned. Row volume = Σ spans ≈ n_docs + n_seqs (each split
    * adds one row), never tokens; the per-doc explode fans out over
    * the doc's own span RANGE only (≤ ⌈nt/cap⌉ + 1 rows).
    */
  def seqPackManifest(spark: SparkSession, sfDir: String,
                      capacity: Int = 64, bucketSize: Long = 0L): DataFrame = {
    val cap = capacity.toLong
    perDocStarts(spark, sfDir, bucketSize)
      .withColumn("seq_id",
        explode(sequence(expr(s"start div ${cap}L"), expr(s"(start + nt - 1) div ${cap}L"))))
      .select(col("doc_id"), col("seq_id"),
        greatest(col("seq_id") * cap - col("start"), lit(0L)).as("off_in_doc"),
        (least((col("seq_id") + 1) * cap, col("start") + col("nt")) -
          greatest(col("seq_id") * cap, col("start"))).as("span_len"))
      .orderBy("doc_id", "seq_id")
  }
}
