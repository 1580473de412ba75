package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[Jpeg]] — the pure-JVM baseline JPEG codec behind q157. The
  * decoder is cross-checked against the JDK's OWN independent ImageIO
  * JPEG decoder on the same byte streams (both directions: our
  * encoder's output, and ImageIO's encoder's output), so "real JPEG"
  * is a referee-verified claim, not a private-dialect round-trip.
  * Lossy tolerances below are per-channel bounds between two correct
  * decoders (IDCT/rounding implementations legitimately differ by
  * ±1–2 per sample).
  */
class JpegSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, seed: Long): Jpeg.Image =
    Jpeg.Image(w, h,
      Array.tabulate(3 * w * h)(j => ((seed * 2654435761L + j * 37) % 256).toByte))

  /** Smooth gradient — realistic photographic content where JPEG at
    * quality-50 stays within a small per-pixel band.
    */
  private def gradient(w: Int, h: Int): Jpeg.Image =
    Jpeg.Image(w, h, Array.tabulate(3 * w * h) { j =>
      val p = j / 3; val x = p % w; val y = p / w
      val v = j % 3 match {
        case 0 => (x * 255) / math.max(1, w - 1)
        case 1 => (y * 255) / math.max(1, h - 1)
        case _ => ((x + y) * 255) / math.max(1, w + h - 2)
      }
      v.toByte
    })

  private def imageIoDecode(bytes: Array[Byte]): Jpeg.Image = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(bi != null, "ImageIO could not parse the stream")
    val w = bi.getWidth; val h = bi.getHeight
    val out = new Array[Byte](3 * w * h)
    val gray = bi.getRaster.getNumBands == 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (gray) {
          // raster samples, NOT getRGB: on TYPE_BYTE_GRAY getRGB runs a
          // linear-gray→sRGB colorspace conversion that distorts values
          val v = bi.getRaster.getSample(x, y, 0).toByte
          out((y * w + x) * 3) = v
          out((y * w + x) * 3 + 1) = v
          out((y * w + x) * 3 + 2) = v
        } else {
          val rgb = bi.getRGB(x, y)
          out((y * w + x) * 3) = ((rgb >> 16) & 0xff).toByte
          out((y * w + x) * 3 + 1) = ((rgb >> 8) & 0xff).toByte
          out((y * w + x) * 3 + 2) = (rgb & 0xff).toByte
        }
        x += 1
      }
      y += 1
    }
    Jpeg.Image(w, h, out)
  }

  private def maxDiff(a: Jpeg.Image, b: Jpeg.Image): Int = {
    assert(a.width === b.width); assert(a.height === b.height)
    a.pixels.indices.map(i => math.abs((a.pixels(i) & 0xff) - (b.pixels(i) & 0xff))).max
  }

  test("the q157 construction law round-trips EXACTLY (constant even-valued blocks)") {
    // even constant gray blocks: DC = 8(c-128) is divisible by the
    // Annex-K luma q00 = 16, chroma planes sit exactly at 128 — the
    // lossy pipeline is exactly invertible by design (Multimodal.jpegTable)
    (0L to 11L).foreach { id =>
      val w = 8 * (2 + (id % 4).toInt); val h = 8 * (1 + (id % 3).toInt)
      val px = Array.tabulate(3 * w * h) { j =>
        val p = j / 3; val x = p % w; val y = p / w
        (2 * ((id * 31 + (x / 8) * 7 + (y / 8) * 13) % 120) + 8).toByte
      }
      val dec = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, px)))
      assert(dec.width === w && dec.height === h)
      assert(dec.pixels.toSeq === px.toSeq, s"doc $id not exact")
    }
  }

  test("our 4:4:4 stream: our decoder agrees with ImageIO's decoder within ±2") {
    val bytes = Jpeg.encode(gradient(40, 24))
    val ours = Jpeg.decode(bytes)
    val ref = imageIoDecode(bytes)
    // 4:4:4 ⇒ no upsampling anywhere; remaining deltas are IDCT and
    // YCbCr-matrix rounding differences between two correct decoders
    assert(maxDiff(ours, ref) <= 2)
  }

  test("our grayscale stream: our decoder agrees with ImageIO's within ±1") {
    val bytes = Jpeg.encode(img(24, 16, 5L), gray = true)
    val ours = Jpeg.decode(bytes)
    val ref = imageIoDecode(bytes)
    // single component: both decoders do Huffman → dequant → IDCT with
    // no color conversion; only IDCT rounding can differ
    assert(maxDiff(ours, ref) <= 1)
    // grayscale decodes to R=G=B
    assert(ours.pixels.grouped(3).forall(g => g(0) == g(1) && g(1) == g(2)))
  }

  test("ImageIO-ENCODED stream (the JDK's own encoder, subsampled) decodes close to ImageIO's decode") {
    val src = gradient(48, 32)
    val bi = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 32).foreach(y => (0 until 48).foreach { x =>
      val p = (y * 48 + x) * 3
      bi.setRGB(x, y, ((src.pixels(p) & 0xff) << 16) |
        ((src.pixels(p + 1) & 0xff) << 8) | (src.pixels(p + 2) & 0xff))
    })
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpeg", bos))
    val bytes = bos.toByteArray
    val ours = Jpeg.decode(bytes)   // foreign stream: tables, subsampling,
    val ref = imageIoDecode(bytes)  // markers all chosen by the JDK writer
    assert(ours.width === 48 && ours.height === 32)
    // the JDK writer subsamples chroma; its decoder upsamples with a
    // smooth (triangle) filter, ours with box replication — on a smooth
    // gradient the decoders stay within a small band
    assert(maxDiff(ours, ref) <= 8)
  }

  test("non-block-aligned dimensions round-trip (edge-replication padding)") {
    val src = gradient(21, 13)
    val dec = Jpeg.decode(Jpeg.encode(src))
    assert(dec.width === 21 && dec.height === 13)
    assert(maxDiff(dec, imageIoDecode(Jpeg.encode(src))) <= 2)
  }

  test("geometry sweep: every width/height residue mod 8 agrees with ImageIO") {
    // covers 1-pixel dimensions, single-block, and every padding shape
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1), (7, 3), (8, 8), (15, 2),
        (2, 15), (17, 11), (33, 17), (16, 5), (5, 16), (24, 7))) {
      val bytes = Jpeg.encode(gradient(w, h))
      val ours = Jpeg.decode(bytes)
      assert(ours.width === w && ours.height === h, s"geometry ${w}x$h")
      assert(maxDiff(ours, imageIoDecode(bytes)) <= 2, s"decoders diverged at ${w}x$h")
    }
  }

  test("restart intervals: DRI + RSTn resync round-trips and matches the no-restart decode") {
    val src = gradient(40, 24)
    val plain = Jpeg.decode(Jpeg.encode(src))
    val withRst = Jpeg.decode(Jpeg.encode(src, restartInterval = 2))
    // restart markers only re-anchor the entropy coder; the decoded
    // raster must be bit-identical to the unrestarted stream's
    assert(withRst.pixels.toSeq === plain.pixels.toSeq)
    // and ImageIO accepts the restart-marked stream too
    assert(maxDiff(imageIoDecode(Jpeg.encode(src, restartInterval = 2)), plain) <= 2)
  }

  test("corrupt blobs throw with named reasons") {
    val good = Jpeg.encode(gradient(16, 16))
    // missing SOI
    assert(intercept[IllegalArgumentException](
      Jpeg.decode(good.drop(2))).getMessage.contains("SOI"))
    // truncated entropy stream
    assert(intercept[IllegalArgumentException](
      Jpeg.decode(good.dropRight(20))).getMessage.contains("truncated"))
    // progressive frame type rejected by name, not mis-decoded
    val prog = good.clone()
    val sofAt = {
      var p = 2
      while (!((prog(p) & 0xff) == 0xff && (prog(p + 1) & 0xff) == 0xc0)) p += 1
      p
    }
    prog(sofAt + 1) = 0xc2.toByte
    assert(intercept[IllegalArgumentException](
      Jpeg.decode(prog)).getMessage.contains("non-baseline"))
    // empty input
    assert(intercept[IllegalArgumentException](
      Jpeg.decode(Array.emptyByteArray)).getMessage.contains("SOI"))
    // header cut mid-segment (before the entropy stream even starts):
    // named truncation, never a raw ArrayIndexOutOfBoundsException
    val sosAt = {
      var p = 2
      while (!((good(p) & 0xff) == 0xff && (good(p + 1) & 0xff) == 0xda))
        p += 1
      p
    }
    (2 until sosAt by 7).foreach { cut =>
      val e = intercept[IllegalArgumentException](Jpeg.decode(good.take(cut)))
      assert(e.getMessage.contains("jpeg:"),
        s"cut at $cut: ${e.getMessage}")
    }
    // a length-LYING segment (DQT claims bytes past EOF) fails by name
    val lying = good.take(sosAt) // headers only, no SOS
    val dqtAt = {
      var p = 2
      while (!((lying(p) & 0xff) == 0xff && (lying(p + 1) & 0xff) == 0xdb))
        p += 1
      p
    }
    lying(dqtAt + 2) = 0x7f.toByte; lying(dqtAt + 3) = 0xff.toByte
    assert(intercept[IllegalArgumentException](
      Jpeg.decode(lying)).getMessage.contains("truncated DQT"))
  }

  test("the q157 law spans many DC magnitude categories (the Huffman lever)") {
    // consecutive blocks' quantized DC values jump by varied amounts —
    // the DPCM differences exercise several DC code lengths, so the
    // oracle hash certifies more than one Huffman path
    val cats = (0L to 11L).flatMap { id =>
      val nbx = 2 + (id % 4).toInt; val nby = 1 + (id % 3).toInt
      val dcs = for (by <- 0 until nby; bx <- 0 until nbx) yield {
        val c = 2 * ((id * 31 + bx * 7 + by * 13) % 120) + 8
        (8 * (c - 128) / 16).toInt // quantized DC
      }
      dcs.zip(0 +: dcs.init).map { case (cur, prev) =>
        val d = math.abs(cur - prev)
        if (d == 0) 0 else 32 - Integer.numberOfLeadingZeros(d)
      }
    }.toSet
    assert(cats.size >= 5, s"law only exercises DC categories $cats")
  }
}
