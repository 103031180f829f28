package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL video container tier (SURVEY.md §2c row 32v, round-13 verdict
  * #6): MJPEG-in-AVI — a RIFF container (the [[Wav]] parser's strict
  * walk-and-verify discipline, same byte order, same loud-corruption
  * contract) whose `movi` chunks are REAL JPEG frames encoded and
  * decoded with `javax.imageio` (the [[ImageCodec]] codec path). This
  * replaces the arithmetic-raster stand-in the mm_frames/mm_scene_cut
  * rows ride (those stay — they pin the explode-shaped frame surface
  * bit-exactly) with the codec chain a real corpus needs: container
  * demux → per-frame lossy decode → frame census + scene segmentation.
  *
  * Payload generation (deterministic, oracle-recomputable): video
  * `media_id` has `3 + id%3` frames of `(8 + id%5) × (6 + id%4)` RGB
  * pixels; pixel (x, y) of frame f has channel value
  * `(id·31 + c·53) mod 128 + 16 + 2x + 3y + 2f + shift`, where
  * `shift = 56` for frames at or past the planted cut point
  * `1 + id % (nFrames−1)` — except videos with `id % 7 == 0`, which
  * have NO cut (shift 0 everywhere). Max channel value 253: never
  * wraps, stays in JPEG's comfortable smooth-gradient regime
  * (measured MAE ≤ 8/channel — ImageCodec's raster family analysis).
  * Every `id % 13 == 0` payload is truncated to 8 bytes (a RIFF
  * magic+size with no form type): the parser returns None and the row
  * surfaces ok=false — malformed media counted, never crashed on.
  *
  * The cut DETECTOR runs on DECODED pixels: consecutive frames whose
  * per-pixel mean luminance-sum |Δ| exceeds 87 are a cut. Margins are
  * engineered, not hoped for: a non-cut step differs by 6/pixel in
  * the underlying rasters (the 2f frame term) and JPEG bias on the
  * MEAN is bounded by the ≤ 8/channel MAE (≤ 24 on the sum), so
  * non-cut ≤ 54 < 87 < 120 ≤ cut (168 planted − 48 worst-case noise)
  * — the oracle can therefore predict n_cuts from the id formula with
  * zero codec knowledge, while the engine can only produce it by
  * actually demuxing and decoding.
  *
  * Scale shape: generation, demux, every JPEG decode, and the census
  * run inside ONE mapPartitions pass — payload bytes never shuffle,
  * never hit the driver; output is |media| skinny rows (same contract
  * as ImageCodec.jpegSummary).
  */
object Avi {

  // ------------------------------------------------------------- build

  private def u32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def fourcc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = body.length % 2 // RIFF chunks are word-aligned
    fourcc(id) ++ u32(body.length.toLong) ++ body ++ Array.fill[Byte](pad)(0)
  }

  private def list(form: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(form) ++ body)

  private[multimodal] def dims(id: Long): (Int, Int, Int) =
    ((id % 5).toInt + 8, (id % 4).toInt + 6, (id % 3).toInt + 3)

  private def channel(id: Long, x: Int, y: Int, c: Int, f: Int, cutAt: Int): Int = {
    val shift = if (id % 7 != 0 && f >= cutAt) 56 else 0
    ((id * 31 + c * 53) % 128).toInt + 16 + 2 * x + 3 * y + 2 * f + shift
  }

  private def frameImage(id: Long, f: Int, w: Int, h: Int, cutAt: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (channel(id, x, y, 0, f, cutAt) << 16) |
          (channel(id, x, y, 1, f, cutAt) << 8) | channel(id, x, y, 2, f, cutAt))
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Build video `id` as a canonical MJPEG-in-AVI byte payload;
    * truncated to 8 bytes when id % 13 == 0 (malformed container).
    */
  private[multimodal] def aviPayload(id: Long): Array[Byte] = {
    val (w, h, nFrames) = dims(id)
    val cutAt = 1 + (id % (nFrames - 1)).toInt
    val frames = (0 until nFrames).map(f => encodeJpeg(frameImage(id, f, w, h, cutAt)))
    // avih: 14 DWORDs (56 bytes)
    val avih = chunk("avih", u32(40000L) ++ u32(0L) ++ u32(0L) ++ u32(0x10L) ++
      u32(nFrames.toLong) ++ u32(0L) ++ u32(1L) ++ u32(0L) ++
      u32(w.toLong) ++ u32(h.toLong) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(0L))
    // strh: fccType vids / handler MJPG, dwLength = nFrames (56 bytes)
    val strh = chunk("strh", fourcc("vids") ++ fourcc("MJPG") ++
      u32(0L) ++ u16(0) ++ u16(0) ++ u32(0L) ++ u32(1L) ++ u32(25L) ++
      u32(0L) ++ u32(nFrames.toLong) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++
      u16(0) ++ u16(0) ++ u16(w) ++ u16(h))
    // strf: BITMAPINFOHEADER, biCompression = 'MJPG' (40 bytes)
    val strf = chunk("strf", u32(40L) ++ u32(w.toLong) ++ u32(h.toLong) ++
      u16(1) ++ u16(24) ++ fourcc("MJPG") ++ u32((w * h * 3).toLong) ++
      u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(0L))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(fb => chunk("00dc", fb)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    val full = fourcc("RIFF") ++ u32(body.length.toLong) ++ body
    if (id % 13 == 0) java.util.Arrays.copyOf(full, 8) else full
  }

  // ------------------------------------------------------------- parse

  /** Demuxed clip: header fields + the raw JPEG bytes of each frame. */
  private[multimodal] final case class Clip(width: Int, height: Int,
                                            totalFrames: Int,
                                            frames: Vector[Array[Byte]])

  /** Strict RIFF/AVI walk (the [[Wav.decode]] discipline): verify the
    * RIFF magic and `AVI ` form type, read avih for declared
    * dims/frame count, collect every `00dc` chunk under `movi`. Any
    * structural violation — truncation, bad magic, chunk overrun —
    * returns None (counted by the caller, never thrown).
    */
  private[multimodal] def decode(bytes: Array[Byte]): Option[Clip] = {
    def le32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
        ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
    def tag(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    val riffSize = le32(4)
    if (riffSize < 4 || 8 + riffSize > bytes.length) return None
    var width = -1; var height = -1; var totalFrames = -1
    var frames = Vector.empty[Array[Byte]]
    // walk chunks in [from, until); recurse into LIST hdrl/strl/movi.
    // Frame chunks are valid ONLY under movi (inMovi) — a structurally
    // misplaced 00dc (top level, inside hdrl) is a corrupt container,
    // not a frame: the strictness contract, same as Wav's walk.
    def walk(from: Int, until: Int, inMovi: Boolean): Boolean = {
      var off = from
      while (off + 8 <= until) {
        val id = tag(off)
        val sz = le32(off + 4)
        if (sz < 0 || off + 8 + sz > until) return false
        val body = off + 8
        id match {
          case "LIST" =>
            if (sz < 4) return false
            val form = tag(body)
            if (form == "hdrl" || form == "strl" || form == "movi")
              { if (!walk(body + 4, body + sz.toInt, form == "movi")) return false }
          case "avih" =>
            if (sz < 40) return false
            totalFrames = le32(body + 16).toInt
            width = le32(body + 32).toInt
            height = le32(body + 36).toInt
          case "00dc" =>
            if (!inMovi) return false
            frames = frames :+ java.util.Arrays.copyOfRange(bytes, body, body + sz.toInt)
          case _ => () // unknown chunks skip (idx1 etc.)
        }
        off = body + sz.toInt + (sz.toInt % 2) // word alignment
      }
      true
    }
    if (!walk(12, 8 + riffSize.toInt, inMovi = false)) return None
    if (width <= 0 || height <= 0 || totalFrames < 0) return None
    Some(Clip(width, height, totalFrames, frames))
  }

  // ------------------------------------------------------------- gate

  /** Demux + decode + census of ONE clip payload: the whole per-clip
    * contract in a pure function (spec-testable with injected corrupt
    * payloads). None on any violation — container walk failure, a
    * frame `javax.imageio` cannot decode, or a frame/header mismatch
    * (count or dims): a half-decodable clip is ok=false, never a
    * partial row.
    */
  private[multimodal] def summarizeClip(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] =
    decode(bytes).flatMap { clip =>
      val decoded = clip.frames.flatMap { fb =>
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb)))
        catch { case scala.util.control.NonFatal(_) => None }
      }
      if (decoded.length != clip.frames.length ||
        decoded.length != clip.totalFrames ||
        decoded.exists(i => i.getWidth != clip.width || i.getHeight != clip.height))
        None
      else {
        val n = clip.width * clip.height
        val lums = decoded.map { img =>
          var s = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val v = img.getRGB(x, y)
              s += ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
              x += 1
            }
            y += 1
          }
          s
        }
        val cuts = lums.sliding(2).count {
          case Vector(a, b) => math.abs(b - a) > 87L * n
          case _ => false
        }
        Some((clip.width, clip.height, decoded.length, cuts))
      }
    }

  /** The `mm_video` gate: [[summarizeClip]] over every generated clip
    * in one mapPartitions pass — payload bytes never shuffle. Oracle
    * recomputes every column from the id formula, codec-free.
    */
  def videoSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        summarizeClip(aviPayload(id)) match {
          case Some((w, h, nf, cuts)) => (id, true, nf.toLong, w.toLong, h.toLong, cuts.toLong)
          case None => (id, false, 0L, 0L, 0L, 0L)
        }
      })
      .toDF("media_id", "ok", "n_frames", "width", "height", "n_cuts")
      .orderBy("media_id")
  }
}
