package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange formats beyond parquet (SURVEY.md §2e): ORC — the
  * other production columnar format (Hive-estate interchange; Spark's
  * native ORC reader supports the same predicate pushdown / column
  * pruning / vectorized read path as parquet, and the spec pins
  * pushdown actually reaching the ORC scan, not just compiling) — and
  * JSON-lines, the raw ingest landing format.
  *
  * The JSONL rules encode the 100 TB ingest discipline:
  *
  *  - SCHEMA IS ALWAYS EXPLICIT. `spark.read.json` without a schema
  *    runs a full inference scan first — at 100 TB that silently
  *    doubles ingest cost, and worse, the inferred schema drifts with
  *    the data (a day with no nulls infers tighter types than a day
  *    with). [[readJsonl]] therefore REQUIRES the schema.
  *  - Bad records are QUARANTINED, not fatal and not dropped:
  *    PERMISSIVE mode with a `_corrupt_record` column keeps the
  *    pipeline running while preserving the evidence (the spec plants
  *    garbage lines and pins both halves). DROPMALFORMED loses the
  *    evidence; FAILFAST loses the pipeline.
  */
object Formats {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-mandatory JSONL read with corrupt-row quarantine: rows
    * that fail to parse land with every data column null and the raw
    * line in `_corrupt_record`; parsed rows carry a null there.
    * Spark restriction worth knowing: a query referencing ONLY the
    * corrupt column straight off the raw source is rejected
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize the parse
    * (cache/checkpoint/write) before triaging the quarantine.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
}
