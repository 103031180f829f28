package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WavSpec extends SparkSpec {

  private def canonical(samples: Array[Int], rate: Int = 8000,
                        channels: Int = 1, bits: Int = 8,
                        fmt: Int = 1): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmt.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(n)
    samples.foreach(s => bb.put(s.toByte))
    bb.array()
  }

  test("decode reads a hand-built canonical PCM file exactly") {
    val a = Wav.decode(canonical(Array(128, 0, 255, 130))).get
    assert(a.channels == 1 && a.sampleRate == 8000)
    assert(a.data.map(_ & 0xFF).toSeq == Seq(128, 0, 255, 130))
  }

  test("decode rejects malformations instead of misreading them") {
    val good = canonical(Array(1, 2, 3, 4))
    assert(Wav.decode(good).isDefined)
    assert(Wav.decode(good.take(8)).isEmpty, "short buffer")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Wav.decode(badMagic).isEmpty, "wrong RIFF magic")
    assert(Wav.decode(canonical(Array(1, 2), fmt = 3)).isEmpty, "non-PCM format")
    assert(Wav.decode(canonical(Array(1, 2), bits = 16)).isEmpty, "16-bit rejected loudly")
    val overrun = good.clone(); overrun(40) = 99 // dataSize > remaining
    assert(Wav.decode(overrun).isEmpty, "data chunk overrun")
  }

  test("audioSummary parses every well-formed clip; truncated clips are counted") {
    val rows = Multimodal.audioSummary(spark, sf0001).collect()
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(rows.length.toLong == d.count())
    val bad = rows.filter(!_.getAs[Boolean]("ok"))
    assert(bad.length.toLong == d.filter(col("doc_id") % 13 === 0).count())
    assert(bad.forall(_.getAs[Long]("media_id") % 13 == 0))
    rows.filter(_.getAs[Boolean]("ok")).foreach { r =>
      assert(r.getAs[Int]("sample_rate") == 8000)
      val n = r.getAs[Long]("n_samples")
      assert(n == 64 + (r.getAs[Long]("media_id") % 50) * 8)
      assert(r.getAs[Long]("duration_ms") == n * 1000 / 8000)
    }
  }
}
