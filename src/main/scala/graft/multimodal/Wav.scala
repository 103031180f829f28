package graft.multimodal

/** Minimal REAL codec for canonical RIFF/WAVE PCM — the public WAV
  * layout (RIFF spec; de-facto canonical 44-byte header): `RIFF`
  * <fileSize le32> `WAVE` `fmt ` <16 le32> <format le16 = 1 (PCM)>
  * <channels le16> <sampleRate le32> <byteRate le32> <blockAlign le16>
  * <bitsPerSample le16> `data` <dataSize le32> <samples>.
  *
  * Same doctrine as [[Ppm]]: the audio operators parse genuine bytes —
  * magic strings, little-endian field arithmetic, chunk sizing — while
  * the oracle recomputes expected stats from the sample GENERATION
  * formula, so a parser off by one byte (or one endianness) fails the
  * hash. Malformed payloads return None and are counted, never thrown.
  * Only 8-bit unsigned PCM is accepted here (the test payloads'
  * format); rejecting everything else loudly beats misreading it.
  */
object Wav {

  final case class Audio(channels: Int, sampleRate: Int, data: Array[Byte])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def magic(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + s.length && s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  /** Parse a canonical 8-bit-PCM WAV payload; None on any malformation
    * (short buffer, wrong magic, non-PCM format, bits ≠ 8, zero
    * channels/rate, data chunk overrunning the buffer).
    */
  def decode(payload: Array[Byte]): Option[Audio] = {
    if (payload.length < 44) return None
    if (!magic(payload, 0, "RIFF") || !magic(payload, 8, "WAVE") ||
      !magic(payload, 12, "fmt ")) return None
    if (le32(payload, 16) != 16L) return None // PCM fmt chunk size
    if (le16(payload, 20) != 1) return None // audioFormat = PCM
    val channels = le16(payload, 22)
    val sampleRate = le32(payload, 24).toInt
    val bits = le16(payload, 34)
    if (channels < 1 || sampleRate < 1 || bits != 8) return None
    if (!magic(payload, 36, "data")) return None
    // le32 is unsigned (values in [0, 2^32)); the overrun check alone
    // rejects every malformed size, including ones with the sign bit set
    val dataSize = le32(payload, 40)
    if (44L + dataSize > payload.length) return None
    Some(Audio(channels, sampleRate,
      java.util.Arrays.copyOfRange(payload, 44, 44 + dataSize.toInt)))
  }
}
