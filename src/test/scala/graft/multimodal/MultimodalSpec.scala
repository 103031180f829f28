package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("metadata projection never reads the payload column") {
    val plan = Multimodal.metadataStats(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("payload"),
      "metadata-only stats must prune the binary payload from the scan")
  }

  test("decode stub: histogram is L1-normalized and deterministic") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(bytes)
    val f2 = Multimodal.decodeStub(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
  }

  test("feature extraction yields one fixed-width vector per media row") {
    val feats = Multimodal.extractFeatures(spark, sf0001)
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(feats.count() == n)
    val r = feats.limit(3).collect()
    assert(r.forall(_.getSeq[Float](1).length == 16))
  }

  test("resize rewrites payload to the target size with updated metadata") {
    val rows = Multimodal.resize(spark, sf0001, w = 8, h = 8).limit(10).collect()
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("payload").length == 64)
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      assert(meta.getAs[Int]("width") == 8 && meta.getAs[Int]("height") == 8)
    }
    // deterministic: same input -> same bytes
    val a = Multimodal.resizeStub("hello multimodal world".getBytes, 4, 4)
    val b = Multimodal.resizeStub("hello multimodal world".getBytes, 4, 4)
    assert(a.toSeq == b.toSeq)
  }

  test("frame sampling explodes each media row into nFrames feature rows") {
    val frames = Multimodal.sampleFrames(spark, sf0001, nFrames = 3)
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(frames.count() == n * 3)
    val perMedia = frames.groupBy("media_id").count().select("count").distinct().collect()
    assert(perMedia.length == 1 && perMedia(0).getLong(0) == 3)
    assert(frames.limit(5).collect().forall(_.getSeq[Float](2).length == 16))
  }

  test("feature summary l1 is ~1 for non-empty payloads") {
    val rows = Multimodal.featureSummary(spark, sf0001).limit(20).collect()
    rows.foreach { r =>
      val l1 = r.getAs[Double]("l1")
      assert(math.abs(l1 - 1.0) < 1e-3, s"l1=$l1")
    }
  }
}
