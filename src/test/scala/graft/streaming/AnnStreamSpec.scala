package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.{Dedup, NearDup}

/** Streaming ANN serving (AnnStream): contract booleans, multi-batch
  * arrival, and bit-parity of the per-batch answer path with the batch
  * LSH top-k.
  */
class AnnStreamSpec extends SparkSpec {

  test("stream_ann: noised probes answered across >= 2 micro-batches, top-1 recovered") {
    val rows = AnnStream.runAnnTop1Bounded(spark, sf0001).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getString(0) == "lsh_stream")
    assert(r.getBoolean(1), "no probes planted")
    assert(r.getBoolean(2), "probe stream must span >= 2 micro-batches")
    assert(r.getBoolean(3), "top-1 contract failed")
  }

  test("answerBatch is bit-identical to the batch lshTopKOf at k=1") {
    val data = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = data.filter(pmod(col("vec_id"), lit(50)) === 0)
    val probes = NearDup.rotatedTo(base, 0.97)
      .select((col("vec_id") + Dedup.PlantOffset).as("probe_id"),
        col("embedding").as("probe_vec"))
      .localCheckpoint()
    val (bands, vectors) = AnnStream.lshIndex(data, nTables = 8, planesPerTable = 6)
    val streamAnswer = AnnStream.answerBatch(bands, vectors, probes, 8, 6)
      .select("probe_id", "neighbor_id", "cosine")
    val batchAnswer = graft.similarity.Ann
      .lshTopKOf(data, probes, k = 1, nTables = 8, planesPerTable = 6)
      .select("probe_id", "neighbor_id", "cosine")
    assert(streamAnswer.except(batchAnswer).count() == 0 &&
      batchAnswer.except(streamAnswer).count() == 0,
      "stream answer path diverged from the batch LSH ranking")
  }
}
