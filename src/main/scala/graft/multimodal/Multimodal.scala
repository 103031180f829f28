package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2c): media as opaque `binary`
  * columns with a typed metadata struct, and per-batch decode /
  * feature-extract operators.
  *
  * The DECODE STEP IS A STUB: the container has no image/audio codecs,
  * so `decodeStub` derives a deterministic fake feature vector from the
  * raw bytes (byte histogram). The Spark-side contract — schema, binary
  * column handling, partition-batched processing via `mapPartitions`,
  * metadata pruning so scans never fetch payloads when only metadata is
  * selected — is real and what matters at 100 TB (payload bytes
  * dominate; column pruning must keep them out of every plan that
  * doesn't decode).
  */
object Multimodal {

  /** Fabricate a deterministic media table from `documents`: payload =
    * utf8 bytes of the text (stand-in for an image blob), plus typed
    * metadata derived from it.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("fake/image").as("mime"),
          // payload BYTE length, not char count — they diverge on any
          // multi-byte text (the corpus has a zh language slot).
          octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
          (pmod(col("doc_id"), lit(16)) * 64 + 64).cast("int").as("width"),
          (pmod(col("doc_id"), lit(9)) * 64 + 64).cast("int").as("height"),
          col("source").as("origin")).as("meta"))

  /** Metadata-only projection — must never read the payload bytes
    * (verify with .explain: ReadSchema excludes `payload`).
    */
  def metadataStats(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .groupBy(col("meta.mime").as("mime"), (col("meta.width") >= 512).as("is_wide"))
      .agg(count(lit(1)).as("n"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        max(col("meta.height")).as("max_height"))
      .orderBy("mime", "is_wide")

  /** STUB decode: real systems would decode image bytes here (JPEG →
    * pixels → model features). Deterministic fake: 16-bin byte
    * histogram, L1-normalized — preserves the operator's shape
    * (binary => fixed-width float vector) and batch structure.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xFF) / 16) += 1f; i += 1 }
    val total = math.max(payload.length, 1).toFloat
    hist.map(_ / total)
  }

  /** Batched feature extraction over the binary column — the Scala
    * analogue of `mapInPandas`: one JVM-side pass per partition, rows
    * processed in a tight loop, output a typed (media_id, features)
    * frame ready for the ANN/dedup operators.
    */
  def extractFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => (id, decodeStub(bytes)) }
      }
      .toDF("media_id", "features")
  }

  /** Summary row set for the verify contract: per-media feature stats. */
  def featureSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = extractFeatures(spark, sfDir)
    feats.select(
      col("media_id"),
      round(aggregate(col("features"), lit(0.0d), (a, v) => a + v.cast("double")), 4).as("l1"),
      round(array_max(col("features")).cast("double"), 4).as("peak"))
      .orderBy("media_id")
  }

  /** STUB resize: a real system would decode, scale to (w, h), and
    * re-encode. Deterministic fake: sample `w*h` bytes evenly from the
    * payload — preserves the contract (binary → binary of the target
    * size, metadata width/height rewritten).
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(w * h, 1))
    val n = math.max(payload.length, 1)
    var i = 0
    while (i < out.length) {
      out(i) = if (payload.isEmpty) 0 else payload((i.toLong * n / out.length).toInt)
      i += 1
    }
    out
  }

  /** Batched resize over the media table: binary in, binary out, typed
    * metadata updated — the per-partition batch shape a real decoder
    * plugs into.
    */
  def resize(spark: SparkSession, sfDir: String, w: Int = 64, h: Int = 64): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, resizeStub(bytes, w, h)) })
      .toDF("media_id", "payload")
      .withColumn("meta", struct(
        lit("fake/image").as("mime"), length(col("payload")).as("n_bytes"),
        lit(w).as("width"), lit(h).as("height"), lit("resized").as("origin")))
  }

  /** Oracle surface for [[resize]]: the resampled payload reduced to an
    * exact checksum (unsigned byte sum + length), so byte-identical
    * resampling is verifiable externally from hex(payload) arithmetic —
    * any off-by-one in the sampling index changes the sum.
    */
  def resizeSummary(spark: SparkSession, sfDir: String,
                    w: Int = 64, h: Int = 64): DataFrame = {
    import spark.implicits._
    resize(spark, sfDir, w, h)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        var s = 0L; var i = 0
        while (i < bytes.length) { s += bytes(i) & 0xFF; i += 1 }
        (id, bytes.length, s)
      })
      .toDF("media_id", "n_bytes", "byte_sum")
      .orderBy("media_id")
  }

  /** STUB frame sampling: a real system would decode a video payload
    * and keep every k-th frame. Deterministic fake: split the payload
    * into `nFrames` contiguous chunks and emit one row per frame with
    * its own feature vector — the explode-shaped operator (one media
    * row → many frame rows) a video pipeline needs.
    */
  def sampleFrames(spark: SparkSession, sfDir: String, nFrames: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val size = math.max(bytes.length / nFrames, 1)
        (0 until nFrames).iterator.map { f =>
          val from = math.min(f * size, bytes.length)
          val until = if (f == nFrames - 1) bytes.length else math.min(from + size, bytes.length)
          (id, f, decodeStub(java.util.Arrays.copyOfRange(bytes, from, until)))
        }
      })
      .toDF("media_id", "frame", "features")
  }

  /** Oracle surface for [[sampleFrames]]: per-frame peak histogram
    * fraction. The stub's bucket is the byte's HIGH NIBBLE, so an
    * external engine can rebuild each frame's histogram from the
    * odd-position characters of `hex(payload)` over the frame's byte
    * range — recovering the decode contract without a codec.
    */
  def frameSummary(spark: SparkSession, sfDir: String, nFrames: Int = 4): DataFrame =
    sampleFrames(spark, sfDir, nFrames)
      .select(col("media_id"), col("frame"),
        round(array_max(col("features")).cast("double"), 4).as("peak"))
      .orderBy("media_id", "frame")
}
