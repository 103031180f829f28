package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Small-file COMPACTION (SURVEY.md §2b) — the day-2 table-maintenance
  * operator next to `q_zorder` (clustering) and `corpus_pack_write`
  * (sharding): the Delta/Iceberg `OPTIMIZE` bin-packing idiom. A
  * long-lived partitioned table accretes small files (every streaming
  * micro-batch or incremental job lands one file per touched
  * partition); scan cost then drifts from data volume to FILE COUNT
  * (driver listing, task scheduling, row-group overhead). Compaction
  * rewrites each partition's file set into ⌈rows/target⌉ full files.
  *
  * Shape: the operator first BUILDS the pathology (a 64-way
  * round-robin ingest × partitionBy lands ~64 tiny files per status
  * partition — deterministic, like q_dpp/q_zorder building their
  * layouts), then compacts with ONE range shuffle:
  * `repartitionByRange(⌈n/target⌉, partitionCol, key)` keeps
  * partition-locality (each output task holds one contiguous
  * (status, key) range, so partitionBy splits it into at most two
  * status dirs) while spreading a large partition across MANY tasks —
  * the 3-value partition column never collapses compaction to 3 tasks
  * (the skew trap of `repartition(partitionCol)`); `maxRecordsPerFile`
  * is the hard per-file cap behind the range sizing. At 100 TB this is
  * exactly the parallel OPTIMIZE job: work ∝ rows touched, parallelism
  * ∝ output file count, no driver-side file juggling.
  *
  * Contract: the read-back census of the compacted table must EQUAL
  * the base table's census (the oracle recomputes it from `orders`
  * directly — compaction is semantically invisible), `compact_ok`
  * pins physically-fewer-files, `cap_ok` pins every output file ≤ the
  * record cap; the spec additionally pins content equality row-for-row
  * (full multiset hash) and the ≥10× file-count reduction.
  */
object Compact {

  private def dir(sfDir: String, tag: String): String =
    graft.util.TempDirs.forInput(sfDir, tag)

  private[queries] def parquetFiles(root: String): Seq[java.nio.file.Path] = {
    val p = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else {
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toVector
      finally s.close()
    }
  }

  /** Build the fragmented layout (overwrite); returns (path, row
    * count). The count comes from the BASE table's compact layout —
    * sizing the later compaction must not itself pay a scan of the
    * pathological many-small-files layout it exists to remove.
    */
  private[queries] def writeFragmented(spark: SparkSession, sfDir: String): (String, Long) = {
    val frag = dir(sfDir, "compact-frag")
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
    base.repartition(64)
      .write.partitionBy("o_orderstatus").mode("overwrite").parquet(frag)
    (frag, base.count())
  }

  /** Compact `frag` (known to hold `n` rows — in production the table
    * metadata/manifest carries this) into `targetRecordsPerFile`-row
    * files (overwrite); returns the compacted path.
    */
  def compact(spark: SparkSession, sfDir: String, frag: String, n: Long,
              targetRecordsPerFile: Int): String = {
    val out = dir(sfDir, "compact-out")
    val nRanges = math.max(1, math.ceil(n.toDouble / targetRecordsPerFile).toInt)
    spark.read.parquet(frag)
      .repartitionByRange(nRanges, col("o_orderstatus"), col("o_orderkey"))
      .write.partitionBy("o_orderstatus")
      .option("maxRecordsPerFile", targetRecordsPerFile.toLong)
      .mode("overwrite").parquet(out)
    out
  }

  def qCompact(spark: SparkSession, sfDir: String,
               targetRecordsPerFile: Int = 50000): DataFrame = {
    val (frag, n) = writeFragmented(spark, sfDir)
    val out = compact(spark, sfDir, frag, n, targetRecordsPerFile)
    val before = parquetFiles(frag).length
    val after = parquetFiles(out).length
    val compacted = spark.read.parquet(out)
    // per-file row counts in one pass over file-name groups (no driver
    // loop over files): the cap certificate
    val maxPerFile = compacted.groupBy(input_file_name()).count()
      .agg(max("count")).head().getLong(0)
    compacted
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        Analytics.moneySum(col("o_totalprice")).as("total"))
      .withColumn("compact_ok", lit(after < before))
      .withColumn("cap_ok", lit(maxPerFile <= targetRecordsPerFile.toLong))
      .orderBy("o_orderstatus")
  }
}
