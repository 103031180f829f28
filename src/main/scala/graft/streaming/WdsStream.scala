package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `stream_webdataset` (SURVEY §2d): STREAMING ingest of a WebDataset
  * tar-shard directory — the PyTorch-format twin of `stream_tfrecord`
  * (34n), driving the SAME shared machinery
  * ([[graft.sources.FileSetMicroBatchStream]]: file-name-set offsets,
  * content-addressed compaction, reachability-ring GC, admission
  * control) through the `graft-webdataset` scan. The census contract
  * is identical: 6 shards consumed at 2 files/trigger (≥3 genuine
  * micro-batches with incremental aggregation state), per-language
  * census in Complete mode converging to the batch census of the
  * ORIGINAL documents table.
  *
  * Scale shape: as 34n — aggregation state is |langs| rows, admission
  * O(new files) per trigger, shard = file = partition; the tar
  * per-member overhead is the format's wire cost (see BASELINE), not
  * a stream property.
  */
object WdsStream {

  private val feedSchema: StructType = StructType(
    StructField(graft.sources.WdsTypes.KeyColumn, StringType) +:
      TfRecordStream.feedSchema.fields.toSeq)

  def streamWebdataset(spark: SparkSession, sfDir: String): DataFrame =
    TfRecordStream.censusOverStream(spark, sfDir,
      format = "graft-webdataset",
      queryName = "graft_stream_webdataset", schema = feedSchema,
      // every sample needs a unique tar basename — the format's key rule
      prepare = _.withColumn(graft.sources.WdsTypes.KeyColumn,
        format_string("%012d", col("doc_id"))))
}
