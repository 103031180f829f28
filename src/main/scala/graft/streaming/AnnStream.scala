package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.dedup.{Dedup, NearDup}
import graft.functions.VectorOps
import graft.similarity.Ann

/** Streaming ANN lookup — the vector-serving topology: a STATIC
  * LSH-bucketed index (built once, like a deployed search index) and a
  * STREAM of probe vectors, answered per micro-batch by a stream-static
  * bucket equi-join + exact cosine re-rank. The lookup is stateless
  * (each probe is answered within its own micro-batch), so there is no
  * state store to bound — the scale limits are the index build (one
  * corpus scan + explode, same as the batch `ann_lsh` path) and the
  * per-batch broadcast of probe bands, both linear.
  *
  * Sink discipline (round-6 stream-stream verdict): per-batch results
  * append to a parquet file sink — nothing accumulates driver-side.
  * Per-batch top-1 is GLOBALLY correct because a probe arrives in
  * exactly one batch; the ranking rule is bit-identical to the batch
  * [[graft.similarity.Ann.lshTopKOf]] (cosine rounded to 6 desc,
  * neighbor_id asc), which is what the parity spec pins.
  *
  * Contract (same regime as `ann_near_top1`): probes are corpus
  * vectors rotated to cosine 0.97, the index must return the unrotated
  * original as top-1 (nearest natural neighbor ≈ 0.5); `chunked_ok`
  * additionally pins that the run actually spanned ≥ 2 micro-batches
  * (maxFilesPerTrigger=1 over a multi-file probe directory), so the
  * boolean can't be earned by a single batch-sized pass.
  */
object AnnStream {

  import Dedup.PlantOffset

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** The static serving index, two checkpointed tables (the layout a
    * deployed index stores): `bands` = one slim row per (table, bucket)
    * membership — ids only, the embedding is NOT duplicated nTables
    * times — and `vectors` = (vec_id, embedding) for the exact re-rank.
    * Checkpointed so the per-batch joins read materialized index rows
    * instead of re-hashing the corpus once per micro-batch.
    */
  def lshIndex(data: DataFrame, nTables: Int,
               planesPerTable: Int): (DataFrame, DataFrame) = {
    val bands = data.select(col("vec_id"),
      explode(Ann.tableBuckets(col("embedding"), nTables, planesPerTable)).as("tb"))
      .select(col("tb.table"), col("tb.bucket"), col("vec_id"))
      .localCheckpoint()
    val vectors = data.select("vec_id", "embedding").localCheckpoint()
    (bands, vectors)
  }

  /** Answer one micro-batch of probes against the static index —
    * the same candidate/ranking semantics as the batch lshTopKOf,
    * restricted to k=1.
    */
  private[streaming] def answerBatch(bands: DataFrame, vectors: DataFrame,
                                     batch: DataFrame,
                                     nTables: Int, planesPerTable: Int): DataFrame = {
    val probeBands = batch
      .select(col("probe_id"),
        explode(Ann.tableBuckets(col("probe_vec"), nTables, planesPerTable)).as("tb"))
      .select(col("tb.table"), col("tb.bucket"), col("probe_id"))
    val pairIds = bands
      .join(probeBands.hint("broadcast"), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select("probe_id", "vec_id")
      .distinct()
    val w = Window.partitionBy("probe_id").orderBy(desc("cosine"), col("vec_id"))
    pairIds
      .join(vectors, "vec_id")
      .join(broadcast(batch), "probe_id")
      .withColumn("cosine", round(VectorOps.cosine(col("embedding"), col("probe_vec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("cosine"))
  }

  /** `stream_ann` — bounded run of the serving topology with the
    * noised-probe contract: (method, planted_ok, chunked_ok, top1_ok).
    */
  def runAnnTop1Bounded(spark: SparkSession, sfDir: String,
                        probeEvery: Int = 50, probeCos: Double = 0.97,
                        nTables: Int = 8, planesPerTable: Int = 6,
                        minRate: Double = 0.90): DataFrame =
  FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/embeddings.parquet") {
    import spark.implicits._
    val data = emb(spark, sfDir).select("vec_id", "embedding")
    NearDup.guardIds(data, "vec_id")
    val base = data.filter(pmod(col("vec_id"), lit(probeEvery)) === 0)
    val nProbes = base.count()
    val probes = NearDup.rotatedTo(base, probeCos)
      .select((col("vec_id") + PlantOffset).as("probe_id"), col("embedding").as("probe_vec"))

    val baseDir = java.nio.file.Files.createTempDirectory("graft-stream-ann-")
    val probeDir = baseDir.resolve("probes").toString
    val outDir = baseDir.resolve("out").toString
    val ckptDir = baseDir.resolve("ckpt").toString
    // 4 files + maxFilesPerTrigger=1 → the query must answer probes in
    // ≥ 2 separate micro-batches for chunked_ok to hold
    probes.repartition(4).write.mode("overwrite").parquet(probeDir)

    val (bands, vectors) = lshIndex(data, nTables, planesPerTable)
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream
      .schema(spark.read.parquet(probeDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(probeDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          nBatches.incrementAndGet()
          answerBatch(bands, vectors, batch, nTables, planesPerTable)
            .write.mode("append").parquet(outDir)
        }
        ()
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val top1 = spark.read.parquet(outDir)
    val hits = top1.filter(col("neighbor_id") === col("probe_id") - PlantOffset).count()
    val rate = if (nProbes == 0) 0.0 else hits.toDouble / nProbes
    Seq(("lsh_stream", nProbes > 0, nBatches.get() >= 2, rate >= minRate))
      .toDF("method", "planted_ok", "chunked_ok", "top1_ok")
  }
}
