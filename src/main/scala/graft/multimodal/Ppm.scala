package graft.multimodal

/** Minimal REAL codec for binary PPM (P6) — the netpbm format, public
  * spec (https://netpbm.sourceforge.net/doc/ppm.html): ASCII header
  * `P6 <width> <height> <maxval>` with whitespace separators and
  * optional `#` comments, one whitespace byte, then `width*height*3`
  * raw RGB bytes (maxval ≤ 255).
  *
  * This replaces the byte-histogram decode STUB for mm_features /
  * mm_resize: the operators now parse genuine image bytes — header
  * arithmetic, raster offsets, nearest-neighbor resampling — while the
  * oracle recomputes expected stats from the image GENERATION rule, so
  * a parser that misreads the header by one byte fails the hash.
  * Malformed payloads return None and are COUNTED by the operators,
  * never thrown.
  */
object Ppm {

  final case class Image(width: Int, height: Int, raster: Array[Byte])

  /** Parse a P6 payload; None on any malformation (wrong magic, comment
    * soup, non-numeric dims, maxval ≠ 1..255, short raster).
    */
  def decode(payload: Array[Byte]): Option[Image] = {
    var pos = 0
    val n = payload.length
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    // whitespace and '#'-to-end-of-line comments between header tokens
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < n) {
        if (isWs(payload(pos))) pos += 1
        else if (payload(pos) == '#') {
          while (pos < n && payload(pos) != '\n') pos += 1
        } else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipWsAndComments()
      val start = pos
      var v = 0L
      while (pos < n && payload(pos) >= '0' && payload(pos) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (payload(pos) - '0'); pos += 1
      }
      if (pos == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    if (n < 2 || payload(0) != 'P' || payload(1) != '6') return None
    pos = 2
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly ONE whitespace byte after maxval, then the raster
      if pos < n && isWs(payload(pos))
      raster <- {
        pos += 1
        val need = w.toLong * h * 3
        if (n - pos < need) None
        else Some(java.util.Arrays.copyOfRange(payload, pos, pos + need.toInt))
      }
    } yield Image(w, h, raster)
  }

  /** Encode an image as P6 with maxval 255. */
  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.raster.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.raster, 0, out, header.length, img.raster.length)
    out
  }

  /** Nearest-neighbor resample to (w, h): out(x, y) ← src(⌊x·sw/w⌋,
    * ⌊y·sh/h⌋) — the floor rule an external oracle reproduces with
    * integer arithmetic.
    */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        val sx = x * img.width / w
        val src = (sy * img.width + sx) * 3
        val dst = (y * w + x) * 3
        out(dst) = img.raster(src)
        out(dst + 1) = img.raster(src + 1)
        out(dst + 2) = img.raster(src + 2)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }
}
