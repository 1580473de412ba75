package graft.ops

/** Minimal pure-JVM baseline JPEG codec (ITU-T T.81 / JFIF) — the
  * last real image format behind the multimodal boundary after PPM
  * (q80), WAV (q108) and PNG (q155). Everything here is
  * public-knowledge JPEG: the marker grammar (SOI/APP/DQT/SOF0/DHT/
  * DRI/SOS/RST/EOI), the Annex K example quantization and Huffman
  * tables, zigzag coefficient order, DPCM-coded DC + run-length AC
  * entropy coding with 0xFF00 byte stuffing, dequantize → 8×8 inverse
  * DCT → level shift, and JFIF YCbCr↔RGB.
  *
  * Decoder scope (everything else throws with a named reason rather
  * than mis-decoding): baseline sequential DCT (SOF0), 8-bit
  * precision, 1 or 3 components, chroma sampling factors 1–2 in each
  * axis (4:4:4, 4:2:2, 4:2:0 — the shapes web-scraped JPEGs actually
  * carry), one scan, optional restart intervals. Chroma upsampling is
  * box replication; JpegSpec cross-checks the whole decoder against
  * the JDK's independent ImageIO decoder on the same byte streams.
  *
  * Encoder scope: 4:4:4 colour or single-component grayscale, the
  * unscaled Annex K tables (≈ libjpeg quality 50), optional restart
  * interval — enough to exercise every decoder path including RST
  * resync, and to produce streams any external JPEG decoder accepts.
  */
object Jpeg {

  /** Decoded image: geometry + raw RGB raster (3 bytes/pixel). */
  case class Image(width: Int, height: Int, pixels: Array[Byte])

  // ---- Annex K tables (ITU-T T.81, Tables K.1–K.2: example
  // luminance/chrominance quantizers; K.3–K.6: typical Huffman
  // tables). Public-knowledge constants, not tuned here.
  val QLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  val QChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag scan order: zigzag(i) = raster index of the i-th
    * coefficient in transmission order.
    */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Huffman table spec = (bits: counts of codes per length 1..16,
  // vals: symbol for each code in canonical order) — T.81 Annex K.
  val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcLumaVals: Array[Int] = (0 to 11).toArray
  val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  val DcChromaVals: Array[Int] = (0 to 11).toArray
  val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val AcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // 1/sqrt(2) normalization factor for the u=0 / v=0 DCT basis rows.
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)
  // cosTable(x)(u) = cos((2x+1)·u·π/16) — shared by FDCT and IDCT.
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---- encoder --------------------------------------------------------

  /** Canonical Huffman code assignment: symbol → (code, length). */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        out(vals(k)) = (code, len); code += 1; k += 1; i += 1
      }
      code <<= 1; len += 1
    }
    out.toMap
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the current byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) { put(0xff, 8 - nbits) }
  }

  /** Magnitude category of a DC difference / AC value (T.81 F.1.2.1.2). */
  private def category(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** The additional bits that pick the value within its category:
    * non-negative values as-is, negatives as v + 2^cat − 1.
    */
  private def amplitudeBits(v: Int, cat: Int): Int =
    if (v >= 0) v else v + (1 << cat) - 1

  /** Memoized FDCT+quantize for CONSTANT blocks — a pure function of
    * (value, quant table), so the result array is computed once per
    * distinct pair and shared (read-only downstream: the entropy
    * writer only reads it). Block-uniform content is the common case
    * in the planted media tables (every 8×8 block is one gray level)
    * and frequent in real low-detail regions; the full 1024-MAC FDCT
    * for such blocks re-derives the same 64 coefficients every time.
    * Keyed by table IDENTITY (luma/chroma are the only two).
    */
  private val constFdctMemo =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Int]]()

  private def fdctQuantMemo(block: Array[Int], q: Array[Int]): Array[Int] = {
    val v0 = block(0)
    var i = 1
    while (i < 64 && block(i) == v0) i += 1
    if (i < 64) fdctQuant(block, q)
    else {
      val key = (v0.toLong << 1) | (if (q eq QLuma) 0L else 1L)
      var out = constFdctMemo.get(key)
      if (out == null) {
        out = fdctQuant(block, q)
        constFdctMemo.putIfAbsent(key, out)
      }
      out
    }
  }

  private def fdctQuant(block: Array[Int], q: Array[Int]): Array[Int] = {
    // spatial → frequency: S(u,v) = C(u)C(v)/4 · Σ s(x,y)·cos·cos,
    // factorized like [[idct]] (row pass t(y,u) = Σ_x s(y,x)·cos_xu,
    // column pass Σ_y t(y,u)·cos_yv) — the encoder runs per frame at
    // media-staging time, same constant argument as the decode side
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var sum = 0.0
        var x = 0
        while (x < 8) { sum += block(y * 8 + x) * Cos(x)(u); x += 1 }
        tmp(y * 8 + u) = sum
        u += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var sum = 0.0
        var yy = 0
        while (yy < 8) { sum += tmp(yy * 8 + u) * Cos(yy)(v); yy += 1 }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        val coef = 0.25 * cu * cv * sum
        out(v * 8 + u) = math.round(coef / q(v * 8 + u)).toInt
        u += 1
      }
      v += 1
    }
    out
  }

  private def writeMarkerSegment(out: java.io.ByteArrayOutputStream,
      marker: Int, payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload)
  }

  private def dhtPayload(tc: Int, th: Int, bits: Array[Int],
      vals: Array[Int]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write((tc << 4) | th)
    (1 to 16).foreach(l => b.write(bits(l)))
    vals.foreach(b.write)
    b.toByteArray
  }

  /** Encode an RGB image as a baseline JFIF JPEG. `gray` collapses to
    * a single-component (luminance-only) stream; `restartInterval` > 0
    * emits DRI + RSTn markers every that-many MCUs. Colour output is
    * 4:4:4 (no subsampling); dimensions need not be block-aligned —
    * edge blocks are padded by edge replication, the standard choice
    * that keeps padded-coefficient energy low.
    */
  def encode(img: Image, gray: Boolean = false, restartInterval: Int = 0): Array[Byte] = {
    require(img.pixels.length == 3 * img.width * img.height,
      s"raster must be 3*w*h bytes, got ${img.pixels.length}")
    val w = img.width; val h = img.height
    val ncomp = if (gray) 1 else 3
    // RGB → (level-shifted) YCbCr planes, padded to block multiples
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val pw = bw * 8; val ph = bh * 8
    val planes = Array.ofDim[Int](ncomp, pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < pw) {
        val sx = math.min(x, w - 1)
        val r = img.pixels((sy * w + sx) * 3) & 0xff
        val g = img.pixels((sy * w + sx) * 3 + 1) & 0xff
        val b = img.pixels((sy * w + sx) * 3 + 2) & 0xff
        val yy = math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
        planes(0)(y * pw + x) = clamp255(yy) - 128
        if (!gray) {
          val cb = math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt
          val cr = math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt
          planes(1)(y * pw + x) = clamp255(cb) - 128
          planes(2)(y * pw + x) = clamp255(cr) - 128
        }
        x += 1
      }
      y += 1
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    writeMarkerSegment(out, 0xe0, // APP0 / JFIF 1.01, no thumbnail
      Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val dqt = new java.io.ByteArrayOutputStream()
    dqt.write(0x00); Zigzag.foreach(i => dqt.write(QLuma(i)))
    if (!gray) { dqt.write(0x01); Zigzag.foreach(i => dqt.write(QChroma(i))) }
    writeMarkerSegment(out, 0xdb, dqt.toByteArray)
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write((h >> 8) & 0xff); sof.write(h & 0xff)
    sof.write((w >> 8) & 0xff); sof.write(w & 0xff)
    sof.write(ncomp)
    var c = 0
    while (c < ncomp) {
      sof.write(c + 1)    // component id
      sof.write(0x11)     // 1×1 sampling (4:4:4)
      sof.write(if (c == 0) 0 else 1) // quant table id
      c += 1
    }
    writeMarkerSegment(out, 0xc0, sof.toByteArray)
    writeMarkerSegment(out, 0xc4, dhtPayload(0, 0, DcLumaBits, DcLumaVals))
    writeMarkerSegment(out, 0xc4, dhtPayload(1, 0, AcLumaBits, AcLumaVals))
    if (!gray) {
      writeMarkerSegment(out, 0xc4, dhtPayload(0, 1, DcChromaBits, DcChromaVals))
      writeMarkerSegment(out, 0xc4, dhtPayload(1, 1, AcChromaBits, AcChromaVals))
    }
    if (restartInterval > 0)
      writeMarkerSegment(out, 0xdd, Array[Byte](
        ((restartInterval >> 8) & 0xff).toByte, (restartInterval & 0xff).toByte))
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(ncomp)
    c = 0
    while (c < ncomp) {
      sos.write(c + 1)
      sos.write(if (c == 0) 0x00 else 0x11) // DC/AC table ids
      c += 1
    }
    sos.write(0); sos.write(63); sos.write(0) // spectral selection (baseline)
    writeMarkerSegment(out, 0xda, sos.toByteArray)

    val dcCodes = Array(buildCodes(DcLumaBits, DcLumaVals),
      buildCodes(DcChromaBits, DcChromaVals))
    val acCodes = Array(buildCodes(AcLumaBits, AcLumaVals),
      buildCodes(AcChromaBits, AcChromaVals))
    var bw2 = new BitWriter(out)
    val dcPred = new Array[Int](ncomp)
    val block = new Array[Int](64)
    var mcu = 0
    var rstIdx = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw2.flush()
          out.write(0xff); out.write(0xd0 + (rstIdx & 7))
          rstIdx += 1
          java.util.Arrays.fill(dcPred, 0)
          bw2 = new BitWriter(out)
        }
        c = 0
        while (c < ncomp) {
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              block(yy * 8 + xx) = planes(c)((by * 8 + yy) * pw + bx * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          val q = if (c == 0) QLuma else QChroma
          val coef = fdctQuantMemo(block, q)
          val ti = if (c == 0) 0 else 1
          // DC: DPCM difference, category + amplitude bits
          val diff = coef(0) - dcPred(c)
          dcPred(c) = coef(0)
          val dcat = category(diff)
          val (dcode, dlen) = dcCodes(ti)(dcat)
          bw2.put(dcode, dlen)
          if (dcat > 0) bw2.put(amplitudeBits(diff, dcat), dcat)
          // AC: (run, size) symbols over zigzag order, ZRL + EOB
          var run = 0
          var k = 1
          while (k < 64) {
            val v = coef(Zigzag(k))
            if (v == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zl) = acCodes(ti)(0xf0); bw2.put(zc, zl); run -= 16
              }
              val acat = category(v)
              val (code, len) = acCodes(ti)((run << 4) | acat)
              bw2.put(code, len)
              bw2.put(amplitudeBits(v, acat), acat)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (ec, el) = acCodes(ti)(0x00); bw2.put(ec, el) }
          c += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw2.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- decoder --------------------------------------------------------

  /** Canonical Huffman decoding tables in T.81 F.2.2.3 form:
    * per code length, the smallest/largest code and the index of its
    * first symbol in `vals`.
    */
  private final class HuffTable(bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1; l += 1
      }
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "jpeg: truncated entropy stream")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "jpeg: truncated entropy stream")
          val m = bytes(pos) & 0xff
          require(m == 0x00, f"jpeg: unexpected marker 0xff$m%02x in entropy stream")
          pos += 1
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def consumeRestart(expected: Int): Unit = {
      nbits = 0
      require(pos + 1 < bytes.length, "jpeg: truncated at restart marker")
      require((bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == 0xd0 + expected,
        f"jpeg: expected RST$expected, got 0x${bytes(pos) & 0xff}%02x${bytes(pos + 1) & 0xff}%02x")
      pos += 2
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = readBit()
      var l = 1
      while (l <= 16 && (t.maxCode(l) == -1 || code > t.maxCode(l))) {
        code = (code << 1) | readBit(); l += 1
      }
      require(l <= 16, "jpeg: invalid huffman code in entropy stream")
      t.vals(t.valPtr(l) + code - t.minCode(l))
    }
  }

  /** Extend amplitude bits to a signed value (T.81 F.2.2.1 EXTEND). */
  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  // cu-scaled basis for the separable IDCT passes:
  // CosC(x)(u) = C(u) · cos((2x+1)uπ/16)
  private val CosC: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) =>
      (if (u == 0) InvSqrt2 else 1.0) * Cos(x)(u))

  private def idct(coef: Array[Int]): Array[Int] = {
    // the 2-D T.81 kernel, FACTORIZED (it is separable): a row pass
    // tmp(v,x) = Σ_u C(u)·coef(v,u)·cos_xu then a column pass
    // out(y,x) = 0.25·Σ_v C(v)·tmp(v,x)·cos_yv — 2·8 MACs per output
    // pixel instead of the naive 64 with four multiplies each. This
    // decoder runs per FRAME under the video/image entries, so its
    // constant is the decode bill (guide §1.2 step 2). The planted
    // media tables are constructed so true pixel values are exact
    // integers (Annex-K-exact coefficients), hence the double
    // summation-order change cannot move any round(): the ~1e-9
    // accumulation error sits eleven orders below the rounding
    // boundary (JpegSpec/AviSpec/PhashSpec re-pin exactness).
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) { sum += coef(v * 8 + u) * CosC(x)(u); u += 1 }
        tmp(v * 8 + x) = sum
        x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var vv = 0
        while (vv < 8) { sum += tmp(vv * 8 + x) * CosC(y)(vv); vv += 1 }
        out(y * 8 + x) = clamp255(math.round(0.25 * sum).toInt + 128)
        x += 1
      }
      y += 1
    }
    out
  }

  private case class Component(id: Int, hs: Int, vs: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
  }

  /** Parse and fully decode a baseline JPEG to RGB. Strict about what
    * it accepts (see object doc); throws IllegalArgumentException with
    * a named reason on malformed or out-of-scope streams. Grayscale
    * streams decode to an RGB raster with R=G=B.
    */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a jpeg: missing SOI")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = -1; var height = -1
    var restartInterval = 0

    def u16(at: Int): Int = {
      require(at + 2 <= bytes.length, "jpeg: truncated segment")
      ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
    }

    var sos = -1
    while (sos < 0) {
      require(pos + 2 <= bytes.length, "jpeg: truncated marker stream")
      require((bytes(pos) & 0xff) == 0xff,
        f"jpeg: expected marker, got 0x${bytes(pos) & 0xff}%02x")
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd8 => // stray SOI
          throw new IllegalArgumentException("jpeg: duplicate SOI")
        case 0xd9 =>
          throw new IllegalArgumentException("jpeg: EOI before SOS")
        case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
          () // standalone markers (TEM, stray RSTn): no length segment
        case 0xc0 =>
          val len = u16(pos)
          // a length-lying or truncated header must fail with a named
          // reason (the entropy-stream error discipline), never a raw
          // ArrayIndexOutOfBoundsException
          require(len >= 8 && pos + len <= bytes.length,
            "jpeg: truncated SOF0 segment")
          require(bytes(pos + 2) == 8,
            s"jpeg: unsupported sample precision ${bytes(pos + 2)}")
          height = u16(pos + 3); width = u16(pos + 5)
          require(width > 0 && height > 0,
            s"jpeg: non-positive dimensions ${width}x$height")
          require(3L * width * height <= Int.MaxValue,
            s"jpeg: raster ${width}x$height too large")
          val nc = bytes(pos + 7) & 0xff
          require(nc == 1 || nc == 3, s"jpeg: unsupported component count $nc")
          require(len == 8 + 3 * nc, s"jpeg: bad SOF0 length $len")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val samp = bytes(o + 1) & 0xff
            val hs = samp >> 4; val vs = samp & 0x0f
            require(hs >= 1 && hs <= 2 && vs >= 1 && vs <= 2,
              s"jpeg: unsupported sampling ${hs}x$vs for component ${bytes(o) & 0xff}")
            Component(bytes(o) & 0xff, hs, vs, bytes(o + 2) & 0xff)
          }
          if (nc == 3)
            require(comps(1).hs == comps(2).hs && comps(1).vs == comps(2).vs,
              "jpeg: chroma components must share sampling factors")
          pos += len
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"jpeg: unsupported (non-baseline) frame type 0x$marker%02x")
        case 0xc4 =>
          val len = u16(pos)
          require(pos + len <= bytes.length, "jpeg: truncated DHT segment")
          var p = pos + 2
          while (p < pos + len) {
            require(p + 17 <= pos + len, "jpeg: truncated DHT")
            val tcth = bytes(p) & 0xff
            val tc = tcth >> 4; val th = tcth & 0x0f
            require(tc <= 1 && th <= 3, s"jpeg: bad DHT header $tcth")
            val bits = new Array[Int](17)
            var total = 0
            (1 to 16).foreach { l =>
              bits(l) = bytes(p + l) & 0xff; total += bits(l)
            }
            require(total <= 256, "jpeg: DHT symbol count > 256")
            require(p + 17 + total <= pos + len, "jpeg: truncated DHT")
            val vals = Array.tabulate(total)(i => bytes(p + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + total
          }
          pos += len
        case 0xdb =>
          val len = u16(pos)
          require(pos + len <= bytes.length, "jpeg: truncated DQT segment")
          var p = pos + 2
          while (p < pos + len) {
            val pqtq = bytes(p) & 0xff
            require(pqtq >> 4 == 0, "jpeg: 16-bit quant tables unsupported")
            val tq = pqtq & 0x0f
            require(tq <= 3, s"jpeg: bad quant table id $tq")
            require(p + 65 <= pos + len, "jpeg: truncated DQT")
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) { q(Zigzag(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
            quant(tq) = q
            p += 65
          }
          pos += len
        case 0xdd =>
          require(u16(pos) == 4, "jpeg: bad DRI length")
          restartInterval = u16(pos + 2)
          pos += 4
        case 0xda =>
          require(comps != null, "jpeg: SOS before SOF")
          val len = u16(pos)
          require(len >= 3 && pos + len <= bytes.length,
            "jpeg: truncated SOS segment")
          val ns = bytes(pos + 2) & 0xff
          require(len >= 6 + 2 * ns, "jpeg: truncated SOS header")
          require(ns == comps.length,
            s"jpeg: scan component count $ns != frame's ${comps.length} (multi-scan unsupported)")
          var i = 0
          while (i < ns) {
            val cid = bytes(pos + 3 + 2 * i) & 0xff
            val tt = bytes(pos + 4 + 2 * i) & 0xff
            val comp = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"jpeg: scan references unknown component $cid"))
            comp.dcTable = tt >> 4; comp.acTable = tt & 0x0f
            i += 1
          }
          sos = pos + len
        case _ if marker >= 0xe0 && marker <= 0xef => pos += u16(pos) // APPn
        case 0xfe => pos += u16(pos) // COM
        case other =>
          throw new IllegalArgumentException(f"jpeg: unexpected marker 0x$other%02x")
      }
    }

    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component plane, at that component's own resolution
    val planeW = comps.map(c => mcusX * c.hs * 8)
    val planeH = comps.map(c => mcusY * c.vs * 8)
    val planes = comps.indices.map(i => new Array[Int](planeW(i) * planeH(i))).toArray
    comps.foreach { cp =>
      require(quant(cp.tq) != null, s"jpeg: component ${cp.id} references missing quant table ${cp.tq}")
      require(dcTabs(cp.dcTable) != null && acTabs(cp.acTable) != null,
        s"jpeg: component ${cp.id} references missing huffman table")
    }

    val br = new BitReader(bytes, sos)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.consumeRestart(rstIdx & 7)
          rstIdx += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val cp = comps(ci)
          val q = quant(cp.tq)
          var byy = 0
          while (byy < cp.vs) {
            var bxx = 0
            while (bxx < cp.hs) {
              java.util.Arrays.fill(coef, 0)
              val dcat = br.decodeHuff(dcTabs(cp.dcTable))
              require(dcat <= 11, s"jpeg: DC category $dcat out of range")
              val diff = extend(br.readBits(dcat), dcat)
              dcPred(ci) += diff
              coef(0) = dcPred(ci) * q(0)
              var hasAc = false
              var k = 1
              while (k < 64) {
                val rs = br.decodeHuff(acTabs(cp.acTable))
                val run = rs >> 4; val size = rs & 0x0f
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else k = 64            // EOB
                } else {
                  k += run
                  require(k < 64, "jpeg: AC run past end of block")
                  coef(Zigzag(k)) = extend(br.readBits(size), size) * q(Zigzag(k))
                  hasAc = true // size > 0 ⇒ a nonzero amplitude
                  k += 1
                }
              }
              val ox = (mx * cp.hs + bxx) * 8
              val oy = (my * cp.vs + byy) * 8
              if (!hasAc) {
                // DC-ONLY fast path (the classic sparse-IDCT shortcut):
                // with every AC zero, [[idct]]'s row pass leaves
                // tmp(0,x) = coef0·CosC(x)(0) and zeros elsewhere, and
                // its column pass 0.25·(tmp·CosC(y)(0)) — the SAME
                // multiply order reproduced here term for term, so the
                // constant is BIT-IDENTICAL to what the full kernel
                // would round (JpegSpec's ImageIO cross-check and the
                // planted-media exactness pins re-certify). Common
                // case: flat regions of real JPEGs, every block of the
                // planted gray tables.
                val c0 = clamp255(
                  math.round(0.25 * ((coef(0) * InvSqrt2) * InvSqrt2)).toInt
                    + 128)
                var yy = 0
                while (yy < 8) {
                  val row = (oy + yy) * planeW(ci) + ox
                  java.util.Arrays.fill(planes(ci), row, row + 8, c0)
                  yy += 1
                }
              } else {
                val px = idct(coef)
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    planes(ci)((oy + yy) * planeW(ci) + ox + xx) = px(yy * 8 + xx)
                    xx += 1
                  }
                  yy += 1
                }
              }
              bxx += 1
            }
            byy += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // entropy data must be followed by EOI (possibly after RST padding)
    {
      var p = br.pos
      while (p + 1 < bytes.length && !((bytes(p) & 0xff) == 0xff &&
        (bytes(p + 1) & 0xff) == 0xd9)) p += 1
      require(p + 1 < bytes.length, "jpeg: missing EOI")
    }

    val out = new Array[Byte](3 * width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (comps.length == 1) {
          val v = planes(0)(y * planeW(0) + x).toByte
          out((y * width + x) * 3) = v
          out((y * width + x) * 3 + 1) = v
          out((y * width + x) * 3 + 2) = v
        } else {
          val yy = planes(0)((y * comps(0).vs / vMax) * planeW(0) + x * comps(0).hs / hMax)
          val cb = planes(1)((y * comps(1).vs / vMax) * planeW(1) + x * comps(1).hs / hMax)
          val cr = planes(2)((y * comps(2).vs / vMax) * planeW(2) + x * comps(2).hs / hMax)
          out((y * width + x) * 3) =
            clamp255(math.round(yy + 1.402 * (cr - 128)).toInt).toByte
          out((y * width + x) * 3 + 1) =
            clamp255(math.round(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)).toInt).toByte
          out((y * width + x) * 3 + 2) =
            clamp255(math.round(yy + 1.772 * (cb - 128)).toInt).toByte
        }
        x += 1
      }
      y += 1
    }
    Image(width, height, out)
  }
}
