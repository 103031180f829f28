package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MJPEG-in-AVI pins (round-13 verdict #6): the container round-trips
  * through the strict RIFF walk, frame census/dims/cuts match the
  * generation formula EXACTLY (the oracle's codec-free contract), and
  * corruption anywhere — truncation, bad magic, chunk overrun, a
  * mangled frame — yields a counted ok=false row, never a crash or a
  * partial answer.
  */
class AviSpec extends SparkSpec {

  test("demux+decode census matches the generation formula exactly " +
    "(frame count, dims, planted cut count) with corrupt rows counted") {
    val got = Avi.videoSummary(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      if (id % 13 == 0) {
        assert(!r.getBoolean(1) && r.getLong(2) == 0L,
          s"truncated container $id must be ok=false with zero columns")
      } else {
        assert(r.getBoolean(1), s"clip $id failed to demux/decode")
        assert(r.getLong(2) == 3 + id % 3, s"clip $id frame count drifted")
        assert(r.getLong(3) == 8 + id % 5 && r.getLong(4) == 6 + id % 4,
          s"clip $id dims drifted")
        val expectCuts = if (id % 7 == 0) 0L else 1L
        assert(r.getLong(5) == expectCuts,
          s"clip $id: ${r.getLong(5)} cuts, expected $expectCuts — the " +
            "luminance margin engineering failed (JPEG noise crossed 87/pixel?)")
      }
    }
  }

  test("corruption is loud but counted: bad magic, an overrunning " +
    "chunk size, and a mangled frame all yield None/ok=false — " +
    "never an exception or a partial clip") {
    val good = Avi.aviPayload(1L) // 1 % 13 != 0 → full container
    assert(Avi.decode(good).isDefined)
    // bad form type
    val badForm = good.clone()
    badForm(8) = 'X'.toByte
    assert(Avi.decode(badForm).isEmpty, "corrupt form type must return None")
    // chunk size pointing past the buffer (offset 4 = RIFF size field)
    val overrun = good.clone()
    overrun(4) = 0xFF.toByte; overrun(5) = 0xFF.toByte
    overrun(6) = 0xFF.toByte; overrun(7) = 0x7F.toByte
    assert(Avi.decode(overrun).isEmpty, "overrunning RIFF size must return None")
    // a mangled JPEG frame: the container WALK still succeeds (chunk
    // structure intact) but summarizeClip must reject the whole clip
    // via its decode-consistency check — wipe the first frame's JPEG
    // bytes (keep the chunk header) with zeros
    val s = new String(good.map(b => (b & 0xFF).toChar))
    val dc = s.indexOf("00dc")
    assert(dc > 0, "no frame chunk found in the generated container")
    val mangled = good.clone()
    var i = dc + 8 // chunk body start = SOI of the first JPEG
    while (i < dc + 8 + 64 && i < mangled.length) { mangled(i) = 0x00; i += 1 }
    assert(Avi.decode(mangled).isDefined,
      "container walk should survive a bad frame payload (chunk sizes intact)")
    assert(Avi.summarizeClip(mangled).isEmpty,
      "a clip with an undecodable frame must summarize to None (ok=false), " +
        "never a partial frame census")
  }

  test("the summary never shuffles payload bytes: one mapPartitions " +
    "pass from the documents scan to skinny rows") {
    val df = Avi.videoSummary(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the only wide operation is the final orderBy sort of skinny rows;
    // no payload column ever appears in an exchange
    assert(!plan.contains("payload"),
      s"payload bytes must stay inside the partition:\n$plan")
  }
}
