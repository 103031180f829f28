package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle (SURVEY.md §2c) — the LAST stage of a
  * training-data pipeline: document order must be (a) pseudo-random
  * (no source/time runs — consecutive same-domain docs measurably
  * hurt training), (b) DETERMINISTIC given a seed (reproducible runs,
  * resumable jobs), and (c) computable WITHOUT a coordinator (any
  * worker must place any doc). The standard construction: order key =
  * cryptographic hash of (seed, doc_id) — a fixed pseudo-random
  * permutation; shard = top bits of the key, training order within a
  * shard = key order.
  *
  * md5 is the hash (not xxhash): both engines implement it
  * IDENTICALLY, so the permutation — not just its statistics — is
  * cross-engine pinned. Keys are unique because doc_id is (spec
  * asserts no collisions anyway — a collision would silently merge
  * two docs' positions).
  *
  * Scale shape: one projection computes keys; shard assignment is a
  * bit-slice of the key (embarrassingly parallel, no shuffle needed
  * to DECIDE placement — the write itself hash-partitions by shard,
  * one exchange); the per-shard manifest (count, token mass, first/
  * last key) is a map-side-combined groupBy on |shards| keys. The
  * in-shard sort happens per shard partition at WRITE time (parallel
  * local sorts, never a global total-order exchange).
  */
object CorpusShuffle {

  /** (doc_id, n_tokens, okey, shard) — the keyed/sharded projection
    * both the manifest and the physical writer run on.
    */
  private def sharded(spark: SparkSession, sfDir: String,
                      seed: String, shards: Int): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val keyed = docs.select(
      col("doc_id"),
      // whitespace token mass — the packing budget the shards balance;
      // ONE codegen'd regexp_count, not the interpreted HOF
      // size(filter(split(…))) shape (same count, TextOps scaladoc)
      TextOps.wsTokenCount(col("text")).cast("long").as("n_tokens"),
      md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))).as("okey"))
    // shard = first 32 bits of the key — a bit-slice, not a shuffle.
    // 32 bits (not one byte): a single byte % shards is modulo-biased
    // whenever shards ∤ 256 (shards=10 → ~4% extra mass on buckets
    // 0–5); 2^32 % shards leaves a bias ≤ shards/2^32 — immaterial.
    keyed.withColumn("shard",
      (conv(substring(col("okey"), 1, 8), 16, 10).cast("long") % shards).cast("long"))
  }

  def corpusShuffle(spark: SparkSession, sfDir: String,
                    seed: String = "graft-r9", shards: Int = 16): DataFrame = {
    sharded(spark, sfDir, seed, shards).groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        min("okey").as("first_key"),
        max("okey").as("last_key"),
        min_by(col("doc_id"), col("okey")).as("first_doc"),
        max_by(col("doc_id"), col("okey")).as("last_doc"))
      .orderBy("shard")
  }

  /** The PHYSICAL writer (`corpus_shuffle_write`) — what a dataloader
    * actually consumes: one hash exchange on `shard`, a PARALLEL
    * per-partition local sort on (shard, okey) — `sortWithinPartitions`,
    * never a global total-order exchange — and a shard-partitioned
    * parquet layout whose files are each internally in training order.
    * The returned audit RE-DERIVES the manifest from the WRITTEN FILES
    * and proves training order with NO Spark-internals assumption:
    * per-row file position comes from `_metadata.row_index` (pinned
    * file-offset semantics, not `monotonically_increasing_id`'s
    * unpinned split-packing order), and the okey lag sweep runs across
    * a shard's WHOLE file sequence ordered by each file's OWN min okey
    * (not by path — Spark's in-name `c%03d` counter breaks
    * lexicographic order at the 1000th file of a task): the writer
    * sorts within the task, so file i's min okey exceeds file i−1's
    * max okey exactly when the files are in write order, which is the
    * property under audit. The small (|shards|-row) audit is
    * materialized on the
    * driver and the written tree deleted before returning — a bench /
    * correctness run leaves no /tmp residue. The DuckDB oracle is the
    * same permutation manifest with `in_order` pinned TRUE — the
    * engine must EARN that literal from the physical files.
    */
  def corpusShuffleWrite(spark: SparkSession, sfDir: String,
                         seed: String = "graft-r9", shards: Int = 16): DataFrame = {
    val outDir = java.nio.file.Files.createTempDirectory("graft-shuffle-out-")
    try {
      sharded(spark, sfDir, seed, shards)
        .repartition(shards, col("shard"))
        .sortWithinPartitions(col("shard"), col("okey"))
        .write.mode("overwrite").partitionBy("shard").parquet(outDir.toString)

      val back = spark.read.parquet(outDir.toString)
        .select(col("shard").cast("long").as("shard"), col("doc_id"),
          col("n_tokens"), col("okey"),
          col("_metadata.file_path").as("f"),
          col("_metadata.row_index").as("pos"))
      import org.apache.spark.sql.expressions.Window
      val ordered = back
        .withColumn("fkey", min("okey").over(Window.partitionBy("f")))
        .withColumn("prev",
          lag(col("okey"), 1).over(Window.partitionBy("shard").orderBy("fkey", "pos")))
      val audit = ordered.groupBy("shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          min("okey").as("first_key"),
          max("okey").as("last_key"),
          min_by(col("doc_id"), col("okey")).as("first_doc"),
          max_by(col("doc_id"), col("okey")).as("last_doc"),
          (sum(when(col("prev").isNull || col("prev") < col("okey"), 0L)
            .otherwise(1L)) === 0L).as("in_order"))
        .orderBy("shard")
      // |shards| rows by construction — safe to land on the driver so
      // the corpus-sized written tree can be deleted before returning
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(audit.collect().toSeq.asJava, audit.schema)
    } finally graft.util.Fs.deleteRecursively(outDir)
  }

  /** `corpus_shuffle_pack` — the pipeline composed END-TO-END: sequence
    * packing ([[SeqPack]] semantics, same BPE-ish token count, same
    * fixed `capacity`) over the SHUFFLED training order, which is what
    * a real pretraining run packs (packing the raw doc_id order and
    * then shuffling sequences would shuffle at the wrong granularity —
    * document halves would stay glued to their split siblings).
    *
    * The token stream is the md5 permutation ([[sharded]]'s `okey`
    * order); the global running offset is the same TWO-LEVEL
    * DISTRIBUTED PREFIX SUM as [[SeqPack.perDocStarts]], keyed by okey
    * instead of doc_id: level-1 buckets are the first 3 hex chars of
    * the key — 4096 CONTIGUOUS key ranges (fixed-width lowercase hex:
    * lexicographic order IS numeric order), so bucket totals cumsum in
    * bucket order = stream order; level-2 is the intra-bucket strict
    * cumsum windowed per bucket (fully parallel, ≈ n/4096 rows each —
    * an md5 prefix is uniform BY CONSTRUCTION, no skew caveat). The
    * single-partition level-1 window sees exactly 4096 rows at ANY
    * corpus size (the rate-spike discipline: bounded by construction).
    *
    * Output = the dataloader ASSIGNMENT MANIFEST of SeqPack (32d4):
    * one row per (document, sequence) span. The DuckDB oracle computes
    * the same spans with its naive single global window over the same
    * permuted stream — different plan, same offsets; the spec pins
    * two-level == naive-window and the three reassembly invariants.
    */
  def corpusShufflePack(spark: SparkSession, sfDir: String,
                        seed: String = "graft-r9", capacity: Int = 64): DataFrame = {
    val cap = capacity.toLong
    shuffledStarts(spark, sfDir, seed)
      .withColumn("seq_id",
        explode(sequence(expr(s"start div ${cap}L"), expr(s"(start + nt - 1) div ${cap}L"))))
      .select(col("doc_id"), col("seq_id"),
        greatest(col("seq_id") * cap - col("start"), lit(0L)).as("off_in_doc"),
        (least((col("seq_id") + 1) * cap, col("start") + col("nt")) -
          greatest(col("seq_id") * cap, col("start"))).as("span_len"))
      .orderBy("doc_id", "seq_id")
  }

  /** Per-doc offsets into the PERMUTED token stream: (doc_id, nt, okey,
    * start) via the okey-keyed two-level prefix sum.
    */
  private[text] def shuffledStarts(spark: SparkSession, sfDir: String,
                                   seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // localCheckpoint: the keyed 3-column frame feeds both prefix-sum
    // levels — without the cut the regex tokenization runs twice
    val keyed = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("nt"),
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))).as("okey"))
      .filter(col("nt") > 0)
      .localCheckpoint()
    val bucketed = keyed.withColumn("bucket", substring(col("okey"), 1, 3))
    val bucketPrefix = bucketed.groupBy("bucket").agg(sum("nt").as("bt"))
      .withColumn("bpre", coalesce(
        sum("bt").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "bpre")
    val intra = Window.partitionBy("bucket").orderBy("okey")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(bucketPrefix, "bucket")
      .withColumn("start", col("bpre") + coalesce(sum("nt").over(intra), lit(0L)))
      .select("doc_id", "nt", "okey", "start")
  }

  /** The pack oracle: DuckDB's naive single global window over the
    * identical permuted stream (same md5 keys, same BPE-ish token
    * count, same exact-integer span arithmetic).
    */
  def packOracleSql(seed: String = "graft-r9", capacity: Int = 64): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(length(regexp_extract_all(text, '[A-Za-z]+')) + length(regexp_extract_all(text, '[0-9]+')) + length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS nt,
       |    md5('$seed:' || CAST(doc_id AS VARCHAR)) AS okey
       |  FROM documents),
       |pre AS (
       |  SELECT doc_id, nt,
       |    CAST(coalesce(sum(nt) OVER (ORDER BY okey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p
       |  FROM toks WHERE nt > 0),
       |m AS (
       |  SELECT doc_id, nt, p,
       |    unnest(generate_series(p // $capacity, (p + nt - 1) // $capacity)) AS seq_id
       |  FROM pre)
       |SELECT doc_id, seq_id,
       |  greatest(seq_id * $capacity - p, 0) AS off_in_doc,
       |  least((seq_id + 1) * $capacity, p + nt) - greatest(seq_id * $capacity, p) AS span_len
       |FROM m ORDER BY doc_id, seq_id""".stripMargin

  /** Identical md5 permutation in DuckDB — the manifest must match
    * value-for-value, pinning the permutation itself cross-engine.
    */
  def oracleSql(seed: String = "graft-r9", shards: Int = 16): String =
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |    length(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n_tokens,
       |    md5('$seed:' || CAST(doc_id AS VARCHAR)) AS okey
       |  FROM documents
       |), sharded AS (
       |  SELECT *, CAST(('0x' || substring(okey, 1, 8)) AS BIGINT) % $shards AS shard
       |  FROM keyed
       |)
       |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(okey) AS first_key, max(okey) AS last_key,
       |  CAST(arg_min(doc_id, okey) AS BIGINT) AS first_doc,
       |  CAST(arg_max(doc_id, okey) AS BIGINT) AS last_doc
       |FROM sharded GROUP BY 1 ORDER BY 1""".stripMargin

  /** The write audit's oracle: the same manifest, with `in_order`
    * pinned TRUE as a literal the engine must earn from the files.
    */
  def writeOracleSql(seed: String = "graft-r9", shards: Int = 16): String =
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |    length(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n_tokens,
       |    md5('$seed:' || CAST(doc_id AS VARCHAR)) AS okey
       |  FROM documents
       |), sharded AS (
       |  SELECT *, CAST(('0x' || substring(okey, 1, 8)) AS BIGINT) % $shards AS shard
       |  FROM keyed
       |)
       |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(okey) AS first_key, max(okey) AS last_key,
       |  CAST(arg_min(doc_id, okey) AS BIGINT) AS first_doc,
       |  CAST(arg_max(doc_id, okey) AS BIGINT) AS last_doc,
       |  TRUE AS in_order
       |FROM sharded GROUP BY 1 ORDER BY 1""".stripMargin
}
