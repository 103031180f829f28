package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL image codecs (SURVEY.md §2c row 32p, round-13 verdict #3):
  * the [[Multimodal.ppmTable]] contract lifted from the
  * arithmetic-generatable netpbm format to the codecs real corpora
  * carry — PNG and JPEG via `javax.imageio` (public JDK API, zero new
  * dependencies).
  *
  * The payload is GENERATED deterministically: image `media_id` is a
  * w×h RGB raster (w = 4+id%5, h = 3+id%4) whose pixel (x, y) has
  * channel value `(id·31 + c·53) mod 128 + 16 + 2x + 3y` for
  * c = 0/1/2 — a per-image per-channel base plus a SMOOTH linear
  * gradient, never wrapping inside an image (max 172 < 256). Smooth
  * on purpose: the ppmTable-style mod-sawtooth raster is pathological
  * for a lossy DCT codec (measured MAE 20-60 at default JPEG
  * quality), while this gradient keeps JPEG error within a tight
  * bound WITHOUT depending on any particular encoder's bits. Drawn
  * into a `BufferedImage`, encoded to PNG executor-side. PNG is
  * LOSSLESS, so after a real `ImageIO.read` decode the per-channel
  * pixel sums are exact integers an external oracle recomputes from
  * the formula without any codec — the engine only matches if it
  * actually ran the codec round-trip. Every `id % 13 == 0` payload is
  * truncated to 8 bytes (a PNG signature with no IHDR):
  * `ImageIO.read` returns null/throws and the row surfaces as
  * ok=false — malformed media is COUNTED, never crashed on.
  *
  * The JPEG leg exercises the lossy codec on the same raster: encode
  * the decoded image to JPEG and decode it back IN the engine.
  * Dimensions survive lossy coding exactly (oracle-pinned);
  * `jpeg_close` pins bounded distortion — mean absolute per-channel
  * error ≤ 8 of 255 on these smooth gradients, a contract that fails
  * loudly if the encode path mangles channel order or geometry (a
  * channel swap shifts a channel's values by a ~53-ish base offset on
  * this formula — an order of magnitude over the bound) while not
  * depending on any particular JPEG implementation's exact bits.
  *
  * Scale shape: generation, both codec round-trips, and the census
  * all happen inside ONE mapPartitions pass — payload bytes never
  * shuffle, never hit the driver; output is |media| skinny rows. At
  * 100 TB the same operator reads the binary column from parquet
  * instead of generating it; the decode plumbing is identical.
  */
object ImageCodec {

  private def channel(id: Long, p: Int, w: Int, c: Int): Int =
    ((id * 31 + c * 53) % 128).toInt + 16 + 2 * (p % w) + 3 * (p / w)

  /** Draw image `id` (w×h from the id mod rules) and PNG-encode it.
    * Truncated to 8 bytes when id % 13 == 0 (malformed payload).
    */
  private[multimodal] def pngPayload(id: Long): Array[Byte] = {
    val w = (id % 5).toInt + 4
    val h = (id % 4).toInt + 3
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      val rgb = (channel(id, p, w, 0) << 16) | (channel(id, p, w, 1) << 8) |
        channel(id, p, w, 2)
      img.setRGB(p % w, p / w, rgb)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val full = bos.toByteArray
    if (id % 13 == 0) java.util.Arrays.copyOf(full, 8) else full
  }

  // NonFatal, not just IOException: the count-don't-crash contract must
  // hold for REAL corrupt payloads too, and ImageIO plugin readers
  // throw RuntimeExceptions (IndexOutOfBounds, NegativeArraySize …) on
  // many malformed inputs the gate's signature-only truncation never
  // exercises.
  private def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  private def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** The `mm_jpeg` gate: per media — PNG decode census (exact channel
    * sums, oracle-recomputed from the generation formula) + JPEG
    * re-encode/decode census (exact dims, bounded distortion).
    */
  def jpegSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        decode(pngPayload(id)) match {
          case Some(img) =>
            val w = img.getWidth
            val h = img.getHeight
            var rs = 0L; var gs = 0L; var bs = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = img.getRGB(x, y)
                rs += (v >> 16) & 0xFF; gs += (v >> 8) & 0xFF; bs += v & 0xFF
                x += 1
              }
              y += 1
            }
            val (jok, jw, jh, close) = decode(encodeJpeg(img)) match {
              case Some(j) =>
                var err = 0L
                var y2 = 0
                while (y2 < j.getHeight) {
                  var x2 = 0
                  while (x2 < j.getWidth && y2 < h && x2 < w) {
                    val a = img.getRGB(x2, y2); val b = j.getRGB(x2, y2)
                    err += math.abs(((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) +
                      math.abs(((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) +
                      math.abs((a & 0xFF) - (b & 0xFF))
                    x2 += 1
                  }
                  y2 += 1
                }
                (true, j.getWidth, j.getHeight, err <= 8L * 3 * w * h)
              case None => (false, 0, 0, false)
            }
            (id, true, w, h, rs, gs, bs, jok, jw, jh, close)
          case None => (id, false, 0, 0, 0L, 0L, 0L, false, 0, 0, false)
        }
      })
      .toDF("media_id", "ok", "width", "height", "r_sum", "g_sum", "b_sum",
        "jpeg_ok", "jpeg_width", "jpeg_height", "jpeg_close")
      .orderBy("media_id")
  }
}
