package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sharding for training-data pipelines: token-budget shard
  * packing and a deterministic stratified train/val/test split — the
  * two operations between "filtered corpus" and "tokenizer input".
  *
  * Scale doctrine:
  *  - Packing is windowed per (lang, bucket), never globally: a single
  *    global cumulative sum is one sort on one reducer — the classic
  *    100 TB deadlock. Bucketing the window key bounds every sort to
  *    corpus/(langs*buckets) rows and keeps all shards independently
  *    addressable as (lang, bucket, shard).
  *  - The split is a pure per-row arithmetic hash — no sampling job, no
  *    global state, reproducible across engines and re-runs. That is
  *    the only split mechanism that survives a corpus too large to
  *    shuffle: membership must be computable from the row alone.
  */
object CorpusShard {

  /** Documents per shard-packing bucket key. 4 buckets × 5 langs = 20
    * independent windows at test scale; at cluster scale this knob is
    * raised so each window's sort fits one task comfortably.
    */
  val PackBuckets = 4

  /** Whitespace-token budget per shard. */
  val ShardTokenBudget = 2000L

  /** Assign each document to a training shard by cumulative token
    * budget within its (lang, bucket) window: a document starts in the
    * shard its preceding cumulative count falls in, so shards hold
    * ~budget tokens in doc_id order. Emits the per-shard census
    * (n_docs, token total, doc_id span) — the manifest a downstream
    * tokenizer run consumes.
    */
  /** Per-document shard assignment — the row-level substrate shared by
    * the census ([[pack]]) and the physical writer ([[writeShards]]):
    * (doc_id, text, lang, bucket, n_tokens, shard).
    */
  private[graft] def assignments(spark: SparkSession, sfDir: String,
                                 budget: Long, buckets: Int): DataFrame = {
    // non-ANSI Spark turns /0 and pmod(_, 0) into silent NULL shard
    // ids (every doc collapses into one null shard) — fail loudly
    require(budget > 0 && buckets > 0, s"invalid pack knobs ($budget, $buckets)")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"),
        pmod(col("doc_id"), lit(buckets)).as("bucket"),
        TextOps.wsTokenCount(col("text")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("lang", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum("n_tokens").over(w))
      .withColumn("shard",
        floor((col("cum") - col("n_tokens")) / budget).cast("int"))
      .drop("cum")
  }

  def pack(spark: SparkSession, sfDir: String,
           budget: Long = ShardTokenBudget,
           buckets: Int = PackBuckets): DataFrame =
    assignments(spark, sfDir, budget, buckets)
      .groupBy("lang", "bucket", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("shard_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("lang", "bucket", "shard")

  /** PHYSICALLY write the packed shards — the step that turns the
    * census into files a tokenizer run can consume — and return the
    * read-back census, which must equal [[pack]]'s manifest (the
    * oracle for `corpus_pack_write` IS the manifest SQL).
    *
    * Layout: parquet partitioned by (lang, bucket, shard), so every
    * shard is independently addressable as a directory and partition
    * pruning serves shard-range reads without touching the rest.
    * `maxRecordsPerFile` caps any single file regardless of how the
    * budget knob is (mis)sized; at cluster scale pair it with the
    * budget so one shard ≈ one task's comfortable input. The write
    * shuffles on the partition keys first (one repartition) so each
    * shard directory is written by ONE task — without it every input
    * task appends a sliver file to every open shard.
    */
  def writeShards(spark: SparkSession, sfDir: String,
                  outDir: Option[String] = None,
                  budget: Long = ShardTokenBudget,
                  buckets: Int = PackBuckets,
                  maxRecordsPerFile: Int = 1000000): DataFrame = {
    val user = sys.props.getOrElse("user.name", "anon").replaceAll("[^A-Za-z0-9._-]", "_")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = outDir.getOrElse(java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft-$user", s"shards-$digest").toString)
    assignments(spark, sfDir, budget, buckets)
      .repartition(col("lang"), col("bucket"), col("shard"))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("lang", "bucket", "shard")
      .parquet(out)
    // read-back census: partition-column types are directory-inferred
    // (ints), cast back to the manifest's types for comparison
    spark.read.parquet(out)
      .groupBy(col("lang"), col("bucket").cast("long").as("bucket"),
        col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("shard_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("lang", "bucket", "shard")
  }

  // LCG constants shared with CorpusMix — see CorpusShardLcg.
  // Thresholds are fraction × 2^31: the comparison reads the high
  // bits of the mixed value, not the structured low bits.
  import CorpusShardLcg.{SplitA, SplitC, SplitM}

  /** Deterministic stratified 80/10/10 split: membership is a pure
    * function of doc_id, so any engine (and any re-run over a grown
    * corpus) agrees on every row without coordination. Reports the
    * per-(lang, split) census with the realized within-lang fraction.
    *
    * The id is reduced mod 2^31 BEFORE the multiply: congruence makes
    * the result identical for ids under 2^31, and the product then
    * peaks at ~2^62 — inside int64 for ANY id, where the raw multiply
    * would silently wrap (or, under ANSI/DuckDB, throw) past
    * doc_id ≈ 8.4e9 — exactly the multi-billion-row corpora this
    * operator exists for.
    */
  def split(spark: SparkSession, sfDir: String,
            trainFrac: Double = 0.80, valFrac: Double = 0.10): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1.0,
      s"invalid split fractions ($trainFrac, $valFrac)")
    val trainLt = math.floor(trainFrac * SplitM).toLong
    val valLt = math.floor((trainFrac + valFrac) * SplitM).toLong
    val h = pmod(pmod(col("doc_id"), lit(SplitM)) * SplitA + SplitC, lit(SplitM))
    val counts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"),
        when(h < trainLt, "train").when(h < valLt, "val").otherwise("test").as("split"))
      .groupBy("lang", "split").agg(count(lit(1)).as("n_docs"))
    // the window runs over the tiny aggregated frame (langs × 3 rows)
    counts
      .withColumn("frac",
        round(col("n_docs") / sum("n_docs").over(Window.partitionBy("lang")), 4))
      .orderBy("lang", "split")
  }
}
