package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.svm.{LabeledVec, Smo, SvmModel}

/** Online iterative SVM over a stream of labeled vectors: each
  * micro-batch trains on (batch ∪ accumulated global support vectors)
  * and folds its new SVs into the global set — the reference's
  * iterative meta-algorithm (Iterative_svm/Itergsv.java:51-110) driven
  * by data arrival instead of driver rounds.
  *
  * State lives on the driver because the global-SV set is the
  * algorithm's own bottleneck state (SVs ≪ data): the same reason the
  * reference keeps global_sv.csv in the DistributedCache. Batches are
  * bounded by the trigger (maxFilesPerTrigger), so the per-batch
  * collect is a bounded micro-batch, not the corpus.
  *
  * `maxGlobalSvs` is the same loud-failure contract as the batch
  * iterative path (ParallelSvm.iterative): on non-separable data
  * n_sv ≈ n, so a 24/7 stream would otherwise accumulate the whole
  * corpus into driver state — fail the query instead of degrading
  * silently.
  */
class StreamingSvm(params: Smo.Params, maxGlobalSvs: Int = 200000) extends Serializable {

  /** (batchId, rows in batch, new SVs, total global SVs) per batch. */
  val batchStats: mutable.Buffer[(Long, Int, Int, Int)] = mutable.Buffer.empty
  private val globalSvs = mutable.LinkedHashMap.empty[Long, LabeledVec]
  @volatile private var lastModel: SvmModel = _

  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val rows = batch.select("vec_id", "label", "embedding").collect()
      .map(r => r.getLong(0) -> LabeledVec(r.getInt(1), r.getSeq[Float](2).toArray))
    if (rows.nonEmpty) {
      val rowIds = rows.iterator.map(_._1).toSet
      val merged: Array[(Long, LabeledVec)] =
        rows ++ globalSvs.iterator.filterNot(g => rowIds(g._1))
      val model = Smo.train(merged.map(_._2), params)
      val newSvs = model.svGlobalIdx.map(merged).filterNot(r => globalSvs.contains(r._1))
      // Cap check BEFORE folding the batch's SVs into state: the failure
      // must precede the growth it is guarding against.
      if (globalSvs.size + newSvs.length > maxGlobalSvs)
        throw new IllegalStateException(
          s"streaming SVM: batch $batchId would grow the global support-vector set to " +
            s"${globalSvs.size + newSvs.length} (> maxGlobalSvs=$maxGlobalSvs) — the " +
            "stream is too non-separable for the iterative meta-algorithm at this cap; " +
            "raise maxGlobalSvs only with driver memory to match")
      newSvs.foreach { case (id, v) => globalSvs.update(id, v) }
      lastModel = model
      batchStats += ((batchId, rows.length, newSvs.length, globalSvs.size))
    }
  }

  def model: SvmModel = lastModel
  def globalSvCount: Int = globalSvs.size

  /** Stream parquet files of (vec_id, label, embedding) from `dir`
    * through the online trainer; AvailableNow processes what exists
    * and terminates (tests / backfill; drop the trigger for 24/7).
    */
  def runBounded(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(dir).schema
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        processBatch(df, id))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stream the REFERENCE'S OWN training format — headerless CSV
    * `label,f1..fd` (cascade_svm/Midcascade.java:111-116) — through the
    * online trainer via [[graft.sources.LabeledCsv.readStream]].
    * Batch/stream parity with [[graft.sources.LabeledCsv.readAsEmbeddings]]
    * is spec-pinned: same files, same ids, same SV trajectory.
    */
  def runBoundedCsv(spark: SparkSession, dir: String, dim: Int,
                    maxFilesPerTrigger: Int = 1): Unit = {
    val q = graft.sources.LabeledCsv.readStream(spark, dir, dim, maxFilesPerTrigger)
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        processBatch(df, id))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
