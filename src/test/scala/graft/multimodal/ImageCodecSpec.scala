package graft.multimodal

import graft.SparkSpec

/** Pins for the mm_jpeg real-codec gate: the corrupt-payload contract
  * (truncated PNG → ok=false, never a crash), a hand-checked pixel sum,
  * and the JPEG leg's exact-dims + bounded-distortion contract.
  */
class ImageCodecSpec extends SparkSpec {

  test("PNG round-trip is exact, truncated payloads surface as ok=false, " +
    "JPEG preserves dims and stays within the distortion bound") {
    val rows = ImageCodec.jpegSummary(spark, sf001).collect()
    assert(rows.nonEmpty)
    val (bad, good) = rows.partition(_.getLong(0) % 13 == 0)
    assert(bad.nonEmpty && bad.forall(r => !r.getBoolean(1)),
      "id%13 truncated payloads must decode as ok=false")
    assert(good.forall(_.getBoolean(1)), "well-formed PNGs must decode")
    // hand check one id: id=1 → w=5, h=4, channel sums from the formula
    good.find(_.getLong(0) == 1L).foreach { r =>
      val (w, h) = (5, 4)
      assert(r.getInt(2) == w && r.getInt(3) == h)
      def sum(c: Int) = (0 until w * h).map(p =>
        (31L + c * 53) % 128 + 16 + 2 * (p % w) + 3 * (p / w)).sum
      assert(r.getLong(4) == sum(0) && r.getLong(5) == sum(1) && r.getLong(6) == sum(2),
        s"channel sums drifted for id=1: $r vs ${sum(0)}/${sum(1)}/${sum(2)}")
    }
    // the JPEG leg: dims always survive lossy coding; distortion bounded
    assert(good.forall(r => r.getBoolean(7) &&
      r.getInt(8) == r.getInt(2) && r.getInt(9) == r.getInt(3)),
      "JPEG round-trip must preserve dimensions exactly")
    val notClose = good.filterNot(_.getBoolean(10))
    assert(notClose.isEmpty,
      s"${notClose.length}/${good.length} images exceed the JPEG distortion bound: " +
        notClose.take(5).mkString(", "))
  }

  test("payload generation is malformed-marker-correct: a truncated PNG " +
    "is signature-only bytes that ImageIO cannot read") {
    val bytes = ImageCodec.pngPayload(13L)
    assert(bytes.length == 8)
    // PNG signature survives the cut — realistic corruption, not garbage
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'.toByte)
    val full = ImageCodec.pngPayload(14L)
    assert(full.length > 8)
  }
}
