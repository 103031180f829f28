package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `corpus_export_tfrecord` — the FINAL hand-off of the training-data
  * pipeline: materialize the tokenized corpus as TFRecord shards in the
  * dataloader's own format (graft-tfrecord, SURVEY §2e row 35b) and
  * prove, via a read-back census, that every document and every token
  * survived the export byte-exactly.
  *
  * This is the stage the reference engine performs with partitioned
  * training files handed to the trainer (uditapatel/Parallel_SVMs
  * Driver.java:31-49) — here the "trainer" is a TF/JAX dataloader and
  * the file format is its native one.
  *
  * Record shape (one per document with ≥1 token):
  *   doc_id int64 · lang bytes · n_tokens int64 ·
  *   token_lens int64 LIST (per-token character lengths, the pinned
  *   BPE-ish tokenizer classes — a variable-length list per record,
  *   the shape a real (doc → token ids) export has)
  * Zero-token documents are EXCLUDED by contract: tf.Example cannot
  * distinguish an empty list from an absent feature, and the writer
  * rejects empty arrays loudly (TfRecord.scala) — the filter is the
  * documented fix, applied identically in the oracle.
  *
  * Scale shape: one scan of documents → per-row regex work (no
  * shuffle) → `repartition(nShards)` decides file count and size (the
  * export's ONLY exchange; shard = file is the format's parallelism
  * contract) → executor-side streaming writes. The census is one
  * map-side-combined aggregate over the read-back. At 100 TB this is
  * scan + one round-robin exchange + shard-local writes — no global
  * sort, no driver funnel; the census re-reads what was written, so a
  * dropped record, a truncated shard or a lossy list round-trip breaks
  * the oracle hash.
  *
  * Census columns are ORDER-INDEPENDENT (sums/counts/max over rows and
  * over list elements), so the oracle reproduces them from the ORIGINAL
  * parquet without caring how records landed in shards: the engine's
  * alternation regex and the oracle's three disjoint-class extractions
  * match the same token multiset (the §2 row 26-family equivalence,
  * here extended from token COUNTS to per-token LENGTHS).
  */
object Export {

  val ExportShards = 8

  def corpusExportTfRecord(spark: SparkSession, sfDir: String,
                           nShards: Int = ExportShards): DataFrame = {
    val toks = regexp_extract_all(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    val records = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        transform(toks, t => length(t).cast("long")).as("token_lens"))
      .withColumn("n_tokens", size(col("token_lens")).cast("long"))
      .filter(col("n_tokens") > 0) // empty list == absent on the wire
    val dir = java.nio.file.Files.createTempDirectory("graft-tfr-export-")
    try {
      records.repartition(nShards)
        .write.format("graft-tfrecord").mode("append").save(dir.toString)
      val back = spark.read.format("graft-tfrecord")
        .schema(records.schema).load(dir.toString)
      val census = back.agg(
        count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_doc_id"),
        countDistinct("lang").as("n_langs"),
        sum("n_tokens").as("sum_tokens"),
        max("n_tokens").as("max_doc_tokens"),
        // every list element reaches the aggregate: total characters
        // across all tokens of the corpus
        sum(aggregate(col("token_lens"), lit(0L), (acc, x) => acc + x))
          .as("tok_chars"))
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(census.collect().toSeq.asJava, census.schema)
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  /** The identical census over the ORIGINAL documents table. Token
    * counts/lengths via the three disjoint classes (same multiset as
    * the engine's alternation regex); list_sum of an empty extraction
    * is NULL in DuckDB → coalesce to 0.
    */
  val tfRecordOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(length(regexp_extract_all(text, '[A-Za-z]+'))
      |       + length(regexp_extract_all(text, '[0-9]+'))
      |       + length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS nt,
      |    CAST(coalesce(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z]+'), x -> length(x))), 0)
      |       + coalesce(list_sum(list_transform(regexp_extract_all(text, '[0-9]+'), x -> length(x))), 0)
      |       + coalesce(list_sum(list_transform(regexp_extract_all(text, '[^A-Za-z0-9\s]'), x -> length(x))), 0) AS BIGINT) AS tc
      |  FROM documents)
      |SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(sum(nt) AS BIGINT) AS sum_tokens,
      |  CAST(max(nt) AS BIGINT) AS max_doc_tokens,
      |  CAST(sum(tc) AS BIGINT) AS tok_chars
      |FROM t WHERE nt > 0""".stripMargin
}
