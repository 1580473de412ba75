package graft.ops

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal pure-JVM PNG codec (8-bit RGB, color type 2, no interlace)
  * — the real image-decode boundary the PPM (q80) and WAV (q108)
  * codecs opened, for the format production corpora actually carry.
  * Everything here is public-knowledge PNG: the 8-byte signature, the
  * chunk grammar (length, type, data, CRC32 over type+data), IHDR
  * field validation, zlib-deflated IDAT (concatenated across chunks),
  * and the five scanline filters (None/Sub/Up/Average/Paeth) with the
  * standard Paeth predictor. The decoder validates what it reads —
  * magic, chunk CRCs, IHDR geometry, inflated raster length — and
  * throws on any malformation: a real decode stage surfaces corrupt
  * blobs instead of emitting garbage features.
  *
  * Scope: bit depth 8, color type 2 (truecolor RGB), compression 0,
  * filter method 0, interlace 0 — the dominant shape of web-scraped
  * PNGs after alpha stripping; anything else throws with a named
  * reason rather than mis-decoding.
  */
object Png {

  /** Decoded image: geometry + raw RGB raster (3 bytes/pixel). */
  case class Image(width: Int, height: Int, pixels: Array[Byte])

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private val Bpp = 3 // RGB, 8 bits per sample

  private def crcOf(typ: Array[Byte], data: Array[Byte]): Int = {
    val c = new CRC32()
    c.update(typ)
    c.update(data)
    c.getValue.toInt
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream,
      typ: String, data: Array[Byte]): Unit = {
    val t = typ.getBytes("US-ASCII")
    val buf = java.nio.ByteBuffer.allocate(4)
    out.write(buf.putInt(0, data.length).array(), 0, 4)
    out.write(t)
    out.write(data)
    out.write(buf.putInt(0, crcOf(t, data)).array(), 0, 4)
  }

  /** Standard Paeth predictor (the PNG spec's tie-break order:
    * left, above, upper-left).
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode with a caller-chosen filter type per scanline (0–4) —
    * filtering is invertible whatever the choice, so an encoder
    * exercising every filter forces the decoder to undo every filter
    * (PngSpec's coverage lever; a real optimizing encoder picks
    * per-row filters the same way).
    */
  def encode(img: Image, filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(img.pixels.length == Bpp * img.width * img.height,
      s"raster must be 3*w*h bytes, got ${img.pixels.length}")
    val stride = Bpp * img.width
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val ft = filterFor(y)
      require(ft >= 0 && ft <= 4, s"png filter type $ft out of range")
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = img.pixels(y * stride + x) & 0xff
        val left = if (x >= Bpp) img.pixels(y * stride + x - Bpp) & 0xff else 0
        val up = if (y > 0) img.pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= Bpp)
          img.pixels((y - 1) * stride + x - Bpp) & 0xff else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) zbuf.write(tmp, 0, d.deflate(tmp))
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor RGB
    ihdr.put(0.toByte)  // compression
    ihdr.put(0.toByte)  // filter method
    ihdr.put(0.toByte)  // interlace
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", zbuf.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse and fully decode a PNG. Strict: signature, per-chunk CRC,
    * IHDR-first, supported-profile IHDR fields, IEND-terminated chunk
    * stream, exact inflated raster length. Throws
    * IllegalArgumentException naming the defect on any malformation.
    */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 8 &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), Signature),
      "not a png: bad signature")
    var pos = 8
    var width = -1; var height = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    def beInt(at: Int): Int = {
      require(at + 4 <= bytes.length, "png: truncated chunk header")
      ((bytes(at) & 0xff) << 24) | ((bytes(at + 1) & 0xff) << 16) |
        ((bytes(at + 2) & 0xff) << 8) | (bytes(at + 3) & 0xff)
    }
    while (!sawIend) {
      val len = beInt(pos)
      require(len >= 0, s"png: negative chunk length $len")
      require(pos + 12L + len <= bytes.length, "png: truncated chunk")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
      val crc = beInt(pos + 8 + len)
      require(crc == crcOf(
        java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 8), data),
        s"png: bad CRC in $typ chunk")
      typ match {
        case "IHDR" =>
          require(!sawIhdr, "png: duplicate IHDR")
          require(len == 13, s"png: IHDR length $len != 13")
          width = beInt(pos + 8); height = beInt(pos + 12)
          require(width > 0 && height > 0,
            s"png: non-positive dimensions ${width}x$height")
          require(3L * width * height <= Int.MaxValue,
            s"png: raster ${width}x$height too large")
          require(data(8) == 8, s"png: unsupported bit depth ${data(8)}")
          require(data(9) == 2, s"png: unsupported color type ${data(9)}")
          require(data(10) == 0, "png: unsupported compression method")
          require(data(11) == 0, "png: unsupported filter method")
          require(data(12) == 0, "png: interlaced images unsupported")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "png: IDAT before IHDR")
          idat.write(data)
        case "IEND" =>
          require(sawIhdr, "png: IEND before IHDR")
          sawIend = true
        case _ => // ancillary chunks (tEXt, pHYs, ...) are skippable
      }
      pos += 12 + len
    }
    val stride = Bpp * width
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        require(n > 0 || inf.finished(), "png: truncated IDAT stream")
        got += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"png: corrupt IDAT: ${e.getMessage}")
    } finally inf.end()
    require(got == raw.length,
      s"png: raster needs ${raw.length} filtered bytes, inflated $got")
    val px = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      require(ft <= 4, s"png: bad filter type $ft on row $y")
      var x = 0
      while (x < stride) {
        val f = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= Bpp) px(y * stride + x - Bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= Bpp)
          px((y - 1) * stride + x - Bpp) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, ul)
        }
        px(y * stride + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, px)
  }
}
