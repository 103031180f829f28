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

  // ------------------------------------------------------ real PPM codec

  test("PPM round trip: encode then decode is the identity") {
    val img = Ppm.Image(3, 2, Array.tabulate(18)(i => (i * 11 % 256).toByte))
    val back = Ppm.decode(Ppm.encode(img))
    assert(back.isDefined)
    assert(back.get.width == 3 && back.get.height == 2)
    assert(back.get.raster.toSeq == img.raster.toSeq)
  }

  test("PPM parser: comments and flexible whitespace per spec; trailing bytes ignored") {
    val raster = Array.tabulate(12)(_.toByte)
    val header = "P6 # comment\n# another comment\n 2\t2 # dims\n255\n".getBytes("US-ASCII")
    val payload = header ++ raster ++ Array[Byte](9, 9, 9)
    val img = Ppm.decode(payload)
    assert(img.isDefined && img.get.width == 2 && img.get.height == 2)
    assert(img.get.raster.toSeq == raster.toSeq)
  }

  test("PPM parser: malformed payloads return None, never throw") {
    val good = Ppm.encode(Ppm.Image(2, 2, new Array[Byte](12)))
    assert(Ppm.decode(Array[Byte]()).isEmpty, "empty")
    assert(Ppm.decode("P5\n2 2\n255\n".getBytes ++ new Array[Byte](12)).isEmpty, "wrong magic")
    assert(Ppm.decode(good.take(4)).isEmpty, "truncated header")
    assert(Ppm.decode(good.dropRight(1)).isEmpty, "short raster")
    assert(Ppm.decode("P6\n0 2\n255\n".getBytes).isEmpty, "zero width")
    assert(Ppm.decode("P6\n2 2\n70000\n".getBytes ++ new Array[Byte](12)).isEmpty, "maxval > 255")
  }

  test("nearest-neighbor resize follows the floor rule") {
    // 2x1 -> 4x1: x=0,1 map to src 0; x=2,3 map to src 1
    val img = Ppm.Image(2, 1, Array[Byte](1, 2, 3, 10, 20, 30))
    val out = Ppm.resizeNearest(img, 4, 1)
    assert(out.raster.toSeq == Seq[Byte](1, 2, 3, 1, 2, 3, 10, 20, 30, 10, 20, 30))
  }

  test("ppmTable payloads are genuine P6 images the codec accepts; id%13=0 malformed") {
    val rows = Multimodal.ppmTable(spark, sf0001).limit(30).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val decoded = Ppm.decode(r.getAs[Array[Byte]](1))
      if (id % 13 == 0) assert(decoded.isEmpty, s"media $id should be malformed")
      else {
        assert(decoded.isDefined, s"media $id should decode")
        val img = decoded.get
        assert(img.width == 2 + (id % 6) && img.height == 2 + (id % 4))
        // raster byte i = (id*31 + i*7) % 256 — the formula the oracle uses
        img.raster.zipWithIndex.foreach { case (b, i) =>
          assert((b & 0xFF) == ((id * 31 + i * 7) % 256).toInt, s"media $id byte $i")
        }
      }
    }
  }

  test("feature summary: parsed dims + peak for valid rows, ok=false for malformed") {
    val rows = Multimodal.featureSummary(spark, sf0001).collect()
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.length == n)
    rows.foreach { r =>
      val (id, ok) = (r.getLong(0), r.getBoolean(1))
      assert(ok == (id % 13 != 0), s"media $id ok=$ok")
      if (ok) {
        assert(r.getInt(2) == 2 + (id % 6) && r.getInt(3) == 2 + (id % 4))
        val peak = r.getDouble(4)
        assert(peak > 0.0 && peak <= 1.0)
      } else assert(r.getInt(2) == 0 && r.getDouble(4) == 0.0)
    }
  }

  test("resize re-encodes valid P6 at the target size; malformed rows carried") {
    val rows = Multimodal.resize(spark, sf0001, 4, 4).limit(30).collect()
    rows.foreach { r =>
      val (id, ok, payload) = (r.getLong(0), r.getBoolean(1), r.getAs[Array[Byte]](2))
      if (ok) {
        val img = Ppm.decode(payload)
        assert(img.isDefined && img.get.width == 4 && img.get.height == 4)
        assert(payload.length == 59)
      } else assert(id % 13 == 0 && payload.isEmpty)
    }
  }

  test("phash: hand-built image hashes to the exact pinned bits; corpus groups reconcile") {
    // 2x2 RGB: grays 60, 600, 0, 304 — total 964, n=4; bit p set iff
    // 4·gray(p) > 964 → pixels 1 and 3 → hash 0b1010 = 10
    val raster = Array[Int](10, 20, 30, 200, 200, 200, 0, 0, 0, 100, 100, 104)
      .map(_.toByte)
    val img = Ppm.Image(2, 2, raster)
    val n = 4
    val gray = (0 until n).map(p =>
      (0 until 3).map(c => img.raster(3 * p + c) & 0xFF).sum.toLong)
    val total = gray.sum
    var hash = 0L
    for (p <- 0 until n) if (gray(p) * n > total) hash |= (1L << p)
    assert(hash == 10L && total == 964L, s"hand hash: $hash total $total")

    val rows = Multimodal.phashDedup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // malformed rows: ok=false, null hash, n_same 0
    assert(rows.filter(!_.getBoolean(1)).forall(r => r.isNullAt(2) && r.getLong(3) == 0L))
    // group sizes reconcile: sum over distinct (phash -> n_same) == ok rows
    val ok = rows.filter(_.getBoolean(1))
    val groups = ok.map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(groups.values.sum == ok.length,
      "every ok image belongs to exactly one hash group")
    assert(groups.values.exists(_ > 1), "small hash space must produce real groups")
  }

  test("frame sampling explodes each media row into nFrames feature rows") {
    val frames = Multimodal.sampleFrames(spark, sf0001, nFrames = 3)
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(frames.count() == n * 3)
    val perMedia = frames.groupBy("media_id").count().select("count").distinct().collect()
    assert(perMedia.length == 1 && perMedia(0).getLong(0) == 3)
    assert(frames.limit(5).collect().forall(_.getSeq[Float](2).length == 16))
  }

  test("scene cuts equal a brute-force threshold pass over the frame peaks") {
    import org.apache.spark.sql.functions._
    val peaks = Multimodal.frameSummary(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expected = peaks.groupBy(_._1).map { case (m, fs) =>
      val ordered = fs.sortBy(_._2).map(_._3)
      val cuts = ordered.sliding(2).count(p => p.length == 2 && math.abs(p(1) - p(0)) > 0.03)
      m -> (ordered.length.toLong, cuts.toLong, cuts.toLong + 1)
    }
    val got = Multimodal.sceneCut(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    val cutCounts = got.values.map(_._2).toSet
    assert(cutCounts.size > 1 && cutCounts.exists(_ > 0),
      "threshold must discriminate: some media cut, with varying counts")
  }
}
