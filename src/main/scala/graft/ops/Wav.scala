package graft.ops

/** Minimal pure-JVM RIFF/WAVE (16-bit PCM) codec — the audio twin of
  * [[Ppm]] behind the multimodal decode boundary. The decoder walks the
  * format's actual chunk grammar, not just what [[encode]] emits: any
  * number of unknown chunks (LIST, cue, bext…) may precede or follow
  * `fmt `/`data` and are skipped by their declared size (odd sizes
  * pad-aligned per RIFF), `fmt ` must declare integer PCM (tag 1) at 16
  * bits, and the samples are little-endian int16. Malformed input
  * throws — a real decode stage surfaces corrupt blobs instead of
  * emitting garbage features.
  */
object Wav {

  /** Decoded audio: format fields + raw int16 samples (interleaved). */
  case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Canonical encoding; `junkChunk` optionally inserts an unknown
    * chunk between `fmt ` and `data` so round-trip tests exercise the
    * decoder's chunk-skipping, exactly as PPM's comment tolerance is
    * exercised by its spec.
    */
  def encode(a: Audio, junkChunk: Option[Array[Byte]] = None): Array[Byte] = {
    require(a.channels > 0, "channels must be positive")
    val dataSize = 2 * a.samples.length
    val byteRate = a.sampleRate * a.channels * 2
    val junk = junkChunk.map { payload =>
      val padded =
        if (payload.length % 2 == 1) payload :+ 0.toByte else payload
      "LIST".getBytes("US-ASCII") ++ le32(payload.length) ++ padded
    }.getOrElse(Array.emptyByteArray)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(a.channels) ++ le32(a.sampleRate) ++
      le32(byteRate) ++ le16(a.channels * 2) ++ le16(16)
    val data = "data".getBytes("US-ASCII") ++ le32(dataSize) ++
      a.samples.flatMap(s => le16(s & 0xffff))
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ junk ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private def rdLe32(b: Array[Byte], p: Int): Int = {
    require(p + 4 <= b.length, s"wav: truncated 32-bit field at byte $p")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  }

  private def rdLe16(b: Array[Byte], p: Int): Int = {
    require(p + 2 <= b.length, s"wav: truncated 16-bit field at byte $p")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  }

  /** Parse a 16-bit-PCM WAVE file. Unknown chunks are skipped by
    * declared size (RIFF pad byte honored); throws
    * IllegalArgumentException on any malformation.
    */
  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      "not a wav: bad RIFF/WAVE magic")
    val riffEnd = math.min(bytes.length.toLong, 8L + rdLe32(bytes, 4))
    var pos = 12
    var rate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (pos + 8 <= riffEnd) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = rdLe32(bytes, pos + 4)
      require(size >= 0 && pos + 8 + size <= riffEnd,
        s"wav: chunk '$id' overruns file (size $size at byte $pos)")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16, s"wav: fmt chunk too small ($size)")
          require(rdLe16(bytes, body) == 1,
            s"wav: not integer PCM (format tag ${rdLe16(bytes, body)})")
          channels = rdLe16(bytes, body + 2)
          rate = rdLe32(bytes, body + 4)
          require(channels > 0, "wav: zero channels")
          require(rate > 0, "wav: non-positive sample rate")
          require(rdLe16(bytes, body + 14) == 16,
            s"wav: only 16-bit samples supported, got ${rdLe16(bytes, body + 14)}")
        case "data" =>
          require(size % 2 == 0, s"wav: odd data size $size")
          samples = Array.tabulate(size / 2)(i =>
            rdLe16(bytes, body + 2 * i).toShort)
        case _ => // unknown chunk: skip
      }
      pos = body + size + (size & 1) // RIFF pads odd chunks
    }
    require(rate > 0, "wav: missing fmt chunk")
    require(samples != null, "wav: missing data chunk")
    Audio(rate, channels, samples)
  }
}
