package graft.ops

/** Minimal pure-JVM binary PPM (P6) codec — a REAL byte-level media
  * parser behind the multimodal decode boundary (the container ships no
  * native codecs, so the format had to be one a few dozen lines of JVM
  * code can parse honestly). The decoder handles the format's actual
  * grammar, not just what [[encode]] emits: `#` comments and arbitrary
  * whitespace anywhere in the header, exactly one whitespace byte
  * between maxval and the raster, and a binary raster of 3·w·h bytes.
  * Malformed input throws — a real decode stage surfaces corrupt blobs
  * instead of emitting garbage features.
  */
object Ppm {

  /** Decoded image: header fields + raw RGB raster (3 bytes/pixel). */
  case class Image(width: Int, height: Int, maxval: Int, pixels: Array[Byte])

  /** Canonical P6 encoding: `P6\n<w> <h>\n<maxval>\n<raster>`. */
  def encode(img: Image): Array[Byte] = {
    require(img.pixels.length == 3 * img.width * img.height,
      s"raster must be 3*w*h bytes, got ${img.pixels.length}")
    val header =
      s"P6\n${img.width} ${img.height}\n${img.maxval}\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'

  /** Parse a P6 image. Whitespace/comment-tolerant header; strict raster
    * length; throws IllegalArgumentException on any malformation.
    */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 ppm: bad magic")
    var pos = 2
    // skip whitespace and '#'-to-end-of-line comments between tokens
    def skipWs(): Unit = {
      var more = true
      while (more && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else more = false
      }
    }
    def intToken(): Int = {
      skipWs()
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos)) && bytes(pos) != '#') pos += 1
      require(pos > start, s"ppm header: expected integer at byte $start")
      val s = new String(bytes, start, pos - start, "US-ASCII")
      val v = try s.toInt catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"ppm header: bad integer '$s'")
      }
      require(v > 0, s"ppm header: non-positive field $v")
      v
    }
    val w = intToken()
    val h = intToken()
    val mv = intToken()
    require(mv <= 255, s"ppm: maxval $mv > 255 (2-byte samples unsupported)")
    // adversarial headers: 3*w*h must not overflow Int (a corrupt blob
    // must throw the guard's error, not a copyOfRange artifact)
    require(3L * w * h <= Int.MaxValue, s"ppm: raster ${w}x$h too large")
    // exactly ONE whitespace byte separates maxval from the raster
    require(pos < bytes.length && isWs(bytes(pos)),
      "ppm: missing whitespace before raster")
    pos += 1
    val n = 3 * w * h
    require(bytes.length - pos >= n,
      s"ppm: truncated raster (need $n bytes, have ${bytes.length - pos})")
    Image(w, h, mv, java.util.Arrays.copyOfRange(bytes, pos, pos + n))
  }
}
