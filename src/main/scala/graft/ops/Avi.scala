package graft.ops

import java.io.ByteArrayOutputStream

/** Minimal RIFF/AVI container with an MJPEG video stream — the honest
  * video half of the multimodal boundary (q170): each '00dc' chunk in
  * the 'movi' list is one complete baseline JPEG that [[Jpeg.decode]]
  * decodes, which is exactly what Motion-JPEG is (OpenDML/AVI RIFF
  * grammar per the public Microsoft AVI spec; MJPEG = concatenated
  * JFIF frames). The muxer writes the standard header path
  * (avih → strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER) → movi →
  * idx1); the demuxer is a strict chunk walker: it validates the RIFF
  * magic, every chunk length against the enclosing list and the blob,
  * the declared-vs-actual frame count, and word alignment — malformed
  * foreign blobs fail with a named IllegalArgumentException, never a
  * raw index error (the [[Jpeg]] error discipline).
  *
  * Reference note: the reference engine has no media path at all
  * (SURVEY §2.8 ABSENT rows); this follows the public AVI RIFF layout.
  */
object Avi {

  /** Parsed container: geometry, timing, and the raw JPEG payloads. */
  case class Video(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]])

  private def u32(b: Array[Byte], at: Int): Long = {
    require(at + 4 <= b.length, "avi: truncated dword")
    ((b(at) & 0xffL)) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
  }

  private def fourcc(b: Array[Byte], at: Int): String = {
    require(at + 4 <= b.length, "avi: truncated fourcc")
    new String(b, at, 4, "US-ASCII")
  }

  // ---- muxer ------------------------------------------------------------

  private def le32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  private def cc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  /** Mux MJPEG frames into a standards-shaped AVI byte stream.
    * Chunks pad to even length (RIFF word alignment); an idx1 index
    * (keyframe-flagged, offsets relative to the movi list data) is
    * appended the way seek-capable players expect.
    */
  def encode(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 5): Array[Byte] = {
    require(frames.nonEmpty, "avi: no frames")
    require(width > 0 && height > 0 && fps > 0, "avi: bad geometry")
    val usPerFrame = 1000000 / fps
    val maxFrame = frames.map(_.length).max

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      cc(o, id); le32(o, body.length.toLong); o.write(body)
      if (body.length % 2 == 1) o.write(0) // pad to word boundary
      o.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      cc(o, "LIST"); le32(o, (body.length + 4).toLong); cc(o, kind)
      o.write(body)
      o.toByteArray
    }

    val avih = { // MainAVIHeader, 14 dwords
      val o = new ByteArrayOutputStream()
      le32(o, usPerFrame.toLong); le32(o, (maxFrame.toLong * fps))
      le32(o, 0); le32(o, 0x10 /* AVIF_HASINDEX */)
      le32(o, frames.length.toLong); le32(o, 0); le32(o, 1 /* streams */)
      le32(o, maxFrame.toLong); le32(o, width.toLong); le32(o, height.toLong)
      (0 until 4).foreach(_ => le32(o, 0))
      o.toByteArray
    }
    val strh = { // AVIStreamHeader, 'vids'/'MJPG'
      val o = new ByteArrayOutputStream()
      cc(o, "vids"); cc(o, "MJPG")
      le32(o, 0); le32(o, 0); le32(o, 0) // flags, prio+lang, initial
      le32(o, 1); le32(o, fps.toLong)    // scale, rate
      le32(o, 0); le32(o, frames.length.toLong) // start, length
      le32(o, maxFrame.toLong); le32(o, 0xffffffffL) // bufSize, quality
      le32(o, 0) // sampleSize
      // rcFrame: left, top, right, bottom as two dwords of shorts
      le32(o, 0)
      le32(o, (width.toLong & 0xffff) | ((height.toLong & 0xffff) << 16))
      o.toByteArray
    }
    val strf = { // BITMAPINFOHEADER with 'MJPG' compression
      val o = new ByteArrayOutputStream()
      le32(o, 40); le32(o, width.toLong); le32(o, height.toLong)
      le32(o, 1L | (24L << 16)) // planes=1, bitcount=24
      cc(o, "MJPG")
      le32(o, 3L * width * height)
      le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0)
      o.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))

    val moviBody = new ByteArrayOutputStream()
    val offsets = frames.map { f =>
      val off = moviBody.size() + 4 // idx1 offsets count from 'movi' tag
      moviBody.write(chunk("00dc", f))
      off
    }
    val movi = list("movi", moviBody.toByteArray)

    val idx1 = {
      val o = new ByteArrayOutputStream()
      frames.zip(offsets).foreach { case (f, off) =>
        cc(o, "00dc"); le32(o, 0x10 /* AVIIF_KEYFRAME */)
        le32(o, off.toLong); le32(o, f.length.toLong)
      }
      chunk("idx1", o.toByteArray)
    }

    val riffBody = new ByteArrayOutputStream()
    cc(riffBody, "AVI ")
    riffBody.write(hdrl); riffBody.write(movi); riffBody.write(idx1)
    val out = new ByteArrayOutputStream()
    cc(out, "RIFF"); le32(out, riffBody.size().toLong)
    riffBody.writeTo(out)
    out.toByteArray
  }

  // ---- demuxer ----------------------------------------------------------

  /** Strict demux: RIFF magic, bounded chunk walk, frame payloads out.
    * Every length is validated against both the enclosing structure
    * and the blob before any byte is read past it.
    */
  def decode(bytes: Array[Byte]): Video = {
    require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF",
      "avi: missing RIFF magic")
    val riffLen = u32(bytes, 4)
    require(8 + riffLen <= bytes.length, "avi: truncated RIFF payload")
    require(fourcc(bytes, 8) == "AVI ", "avi: not an AVI RIFF form")

    var width = -1; var height = -1; var usPerFrame = -1
    var declared = -1L
    val frames = Seq.newBuilder[Array[Byte]]

    // walk the chunks of [from, until); recurse into LISTs. Real AVI
    // nests <= 3 deep (RIFF > hdrl > strl); the cap turns a hostile
    // deeply-nested blob into a named error instead of a stack
    // overflow. `inMovi` tracks whether the walk is inside a 'movi'
    // LIST (propagated through the 'rec ' grouping lists the grammar
    // allows there): frame chunks are ONLY legal in movi — one found
    // anywhere else (hdrl, strl, top level) is a grammar violation
    // and fails by name, so a malformed blob can't smuggle frames
    // past the declared-vs-actual count check
    def walk(from: Int, until: Int, depth: Int = 0,
        inMovi: Boolean = false): Unit = {
      require(depth <= 16, "avi: LIST nesting too deep")
      var p = from
      while (p < until) {
        require(p + 8 <= until, "avi: truncated chunk header")
        val id = fourcc(bytes, p)
        val len = u32(bytes, p + 4)
        require(len <= Int.MaxValue - 8, "avi: absurd chunk length")
        val body = p + 8
        require(body + len <= until,
          s"avi: chunk $id overruns its enclosing structure")
        id match {
          case "LIST" =>
            require(len >= 4, "avi: LIST too short for a type tag")
            val kind = fourcc(bytes, body)
            walk(body + 4, body + len.toInt, depth + 1, // skip the type tag
              inMovi = inMovi || kind == "movi")
          case "avih" =>
            require(len >= 40, "avi: truncated avih")
            usPerFrame = u32(bytes, body).toInt
            declared = u32(bytes, body + 16)
            width = u32(bytes, body + 32).toInt
            height = u32(bytes, body + 36).toInt
          case "00dc" | "00db" =>
            require(inMovi, s"avi: frame chunk $id outside a movi LIST")
            frames += java.util.Arrays.copyOfRange(bytes, body,
              body + len.toInt)
          case _ => () // strh/strf/idx1/JUNK: validated above, skipped
        }
        p = body + len.toInt + (len % 2).toInt // skip the pad byte
      }
    }
    walk(12, 8 + riffLen.toInt)

    require(width > 0 && height > 0 && usPerFrame > 0,
      "avi: missing or malformed avih header")
    val fs = frames.result()
    require(declared == fs.length,
      s"avi: header declares $declared frames, movi carries ${fs.length}")
    Video(width, height, usPerFrame, fs)
  }
}
