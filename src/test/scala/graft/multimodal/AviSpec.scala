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
    // a structurally MISPLACED frame chunk (00dc at RIFF top level, not
    // under movi) is a corrupt container, not a frame: rebuild the good
    // payload as RIFF(AVI (hdrl, 00dc@top)) and require None
    def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    def u32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val hdrlLen = 8 + le32(good, 16) + (le32(good, 16) % 2)
    val hdrl = java.util.Arrays.copyOfRange(good, 12, 12 + hdrlLen)
    val clip = Avi.decode(good).get
    val f0 = clip.frames.head
    val strayFrame = "00dc".getBytes("US-ASCII") ++ u32(f0.length) ++ f0 ++
      (if (f0.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val body2 = "AVI ".getBytes("US-ASCII") ++ hdrl ++ strayFrame
    val misplaced = "RIFF".getBytes("US-ASCII") ++ u32(body2.length) ++ body2
    assert(Avi.decode(misplaced).isEmpty,
      "a 00dc chunk outside movi must fail the strict walk, never be " +
        "counted as a frame")
  }

  test("the summary never shuffles payload bytes: every exchange in " +
    "the plan carries only the skinny census columns, no binary data") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.types.BinaryType
    val df = Avi.videoSummary(spark, sf0001)
    df.collect() // materialize so AQE's final plan (stages included) exists
    // AQE wraps pipeline segments in QueryStageExec leaves — recurse
    def deepExchanges(plan: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeLike] = {
      val direct = plan.collect { case e: ShuffleExchangeLike => e }
      val nested = plan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case q: QueryStageExec => q.plan
      }.flatMap(deepExchanges)
      direct ++ nested
    }
    val exchanges = deepExchanges(df.queryExecution.executedPlan)
    assert(exchanges.nonEmpty, "expected the final orderBy's range exchange")
    exchanges.foreach { e =>
      assert(!e.output.exists(_.dataType == BinaryType),
        s"an exchange carries binary payload bytes — generation, demux " +
          s"and decode must all stay inside one partition-local pass: " +
          s"${e.output.map(a => s"${a.name}:${a.dataType.simpleString}")}")
    }
  }
}
