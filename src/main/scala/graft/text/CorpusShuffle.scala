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
      // whitespace token mass — the packing budget the shards balance
      size(filter(split(col("text"), "\\s+"), t => t =!= "")).cast("long").as("n_tokens"),
      md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))).as("okey"))
    // shard = first byte of the key — a bit-slice, not a shuffle
    keyed.withColumn("shard",
      (conv(substring(col("okey"), 1, 2), 16, 10).cast("long") % shards).cast("long"))
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
    * and proves in-file order (per-file lag sweep over the read-back —
    * rows of a parquet file arrive in file order within each split, and
    * a file's rows are contiguous per read partition, so the
    * (file, row-position) lag is the file's true order). The DuckDB
    * oracle is the same permutation manifest with `in_order` pinned
    * TRUE — the engine must EARN that literal from the physical files.
    */
  def corpusShuffleWrite(spark: SparkSession, sfDir: String,
                         seed: String = "graft-r9", shards: Int = 16): DataFrame = {
    val outDir = java.nio.file.Files.createTempDirectory("graft-shuffle-out-").toString
    sharded(spark, sfDir, seed, shards)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("okey"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

    val back = spark.read.parquet(outDir)
      .select(col("shard").cast("long").as("shard"), col("doc_id"),
        col("n_tokens"), col("okey"),
        input_file_name().as("f"), monotonically_increasing_id().as("pos"))
    import org.apache.spark.sql.expressions.Window
    val ordered = back.withColumn("prev",
      lag(col("okey"), 1).over(Window.partitionBy("f").orderBy("pos")))
    ordered.groupBy("shard")
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
  }

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
       |  SELECT *, CAST(('0x' || substring(okey, 1, 2)) AS BIGINT) % $shards AS shard
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
       |  SELECT *, CAST(('0x' || substring(okey, 1, 2)) AS BIGINT) % $shards AS shard
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
