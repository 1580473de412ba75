package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** RIFF/AVI MJPEG container ([[Avi]]) — the video half of q170. Pins:
  *
  *   - mux → demux round-trips every frame payload BYTE-EXACT (the
  *     container must never touch entropy bytes), plus geometry and
  *     timing metadata
  *   - RIFF word alignment: odd-length frames pad on disk but
  *     round-trip unpadded
  *   - demuxed frames decode via [[Jpeg.decode]] to the same rasters
  *     as the pre-mux originals (container ∘ codec composes)
  *   - malformed containers fail with NAMED errors (the [[Jpeg]]
  *     error discipline): bad magic, length-lying chunks, truncated
  *     payloads, frame-count disagreement
  */
class AviSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, c: Int): Jpeg.Image = {
    val px = Array.fill(3 * w * h)(c.toByte)
    Jpeg.Image(w, h, px)
  }

  private def frames(n: Int): Seq[Array[Byte]] =
    (0 until n).map(f => Jpeg.encode(gray(16, 16, 8 + 2 * f)))

  test("mux -> demux round-trips frames byte-exact with honest metadata") {
    val fs = frames(5)
    val v = Avi.decode(Avi.encode(fs, 16, 16, fps = 5))
    assert(v.width === 16 && v.height === 16)
    assert(v.usPerFrame === 200000)
    assert(v.frames.size === 5)
    v.frames.zip(fs).foreach { case (got, want) =>
      assert(got.toSeq === want.toSeq, "container altered entropy bytes")
    }
  }

  test("odd-length frames pad to word boundaries and still round-trip") {
    // force odd payload lengths by appending a comment-free tweak:
    // JPEG streams end at EOI, so a trailing pad byte in the CHUNK
    // must not leak into the payload
    val fs = frames(3).map { f =>
      if (f.length % 2 == 0) f :+ 0x00.toByte else f // make some odd
    }
    assert(fs.exists(_.length % 2 == 1), "fixture should have odd frames")
    val v = Avi.decode(Avi.encode(fs, 16, 16))
    v.frames.zip(fs).foreach { case (got, want) =>
      assert(got.toSeq === want.toSeq)
    }
  }

  test("demuxed frames decode to the pre-mux rasters (container composes with codec)") {
    val imgs = (0 until 4).map(f => gray(24, 8, 10 + 4 * f))
    val v = Avi.decode(Avi.encode(imgs.map(Jpeg.encode(_)), 24, 8))
    v.frames.zip(imgs).foreach { case (fb, img) =>
      val dec = Jpeg.decode(fb)
      assert(dec.width === img.width && dec.height === img.height)
      assert(dec.pixels.toSeq === img.pixels.toSeq,
        "constant-gray law must survive mux -> demux -> decode exactly")
    }
  }

  test("malformed containers fail with named reasons") {
    val good = Avi.encode(frames(2), 16, 16)
    // wrong magic
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](
      Avi.decode(notRiff)).getMessage.contains("RIFF"))
    // RIFF but not AVI
    val notAvi = good.clone(); notAvi(8) = 'W'.toByte
    assert(intercept[IllegalArgumentException](
      Avi.decode(notAvi)).getMessage.contains("AVI"))
    // truncated payload (RIFF size now lies past EOF)
    assert(intercept[IllegalArgumentException](
      Avi.decode(good.dropRight(10))).getMessage.contains("truncated"))
    // length-lying movi chunk: blow up the first 00dc length field
    val lying = good.clone()
    val dcAt = {
      var p = 12
      while (!(lying(p) == '0' && lying(p + 1) == '0' &&
        lying(p + 2) == 'd' && lying(p + 3) == 'c')) p += 1
      p
    }
    lying(dcAt + 4) = 0xff.toByte; lying(dcAt + 5) = 0xff.toByte
    assert(intercept[IllegalArgumentException](
      Avi.decode(lying)).getMessage.contains("overruns"))
    // frame-count disagreement: header declares 2, movi carries 1 —
    // rebuild with a surgically dropped chunk is involved, so instead
    // lie in avih's totalFrames field
    val miscount = good.clone()
    val avihAt = {
      var p = 12
      while (!(miscount(p) == 'a' && miscount(p + 1) == 'v' &&
        miscount(p + 2) == 'i' && miscount(p + 3) == 'h')) p += 1
      p
    }
    miscount(avihAt + 8 + 16) = 9 // dwTotalFrames = 9
    assert(intercept[IllegalArgumentException](
      Avi.decode(miscount)).getMessage.contains("declares"))
    // empty input
    assert(intercept[IllegalArgumentException](
      Avi.decode(Array.emptyByteArray)).getMessage.contains("RIFF"))
    // a hostile deeply-nested LIST blob fails by name, never by
    // stack overflow: 1000 nested "LIST xxxx" shells
    val depth = 1000
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val inner = 4 + depth * 12 // "AVI " + the nested shells
    def le(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    out.write(le(inner))
    out.write("AVI ".getBytes("US-ASCII"))
    (0 until depth).foreach { i =>
      out.write("LIST".getBytes("US-ASCII"))
      out.write(le((depth - i) * 12 - 8)) // body = type tag + next shell
      out.write("nest".getBytes("US-ASCII"))
    }
    assert(intercept[IllegalArgumentException](
      Avi.decode(out.toByteArray)).getMessage.contains("nesting"))
  }

  test("a frame chunk outside the movi LIST is rejected by name") {
    // a well-formed 1-frame AVI, then a stray 00dc appended at top
    // level (after idx1): declared==actual inside movi would still
    // hold if the stray were silently counted — the strict grammar
    // must instead fail on its location
    def le(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val good = Avi.encode(frames(1), 16, 16)
    val stray = "00dc".getBytes("US-ASCII") ++ le(2) ++ Array[Byte](1, 2)
    val out = good ++ stray
    // patch the RIFF size to cover the stray chunk so the only
    // violation left is the chunk's LOCATION
    val newLen = out.length - 8
    System.arraycopy(le(newLen), 0, out, 4, 4)
    assert(intercept[IllegalArgumentException](
      Avi.decode(out)).getMessage.contains("outside a movi"))
    // and the unpatched original still decodes (the fix is not
    // rejecting valid containers)
    assert(Avi.decode(good).frames.size === 1)
  }
}
