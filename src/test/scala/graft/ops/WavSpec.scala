package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class WavSpec extends AnyFunSuite {
  private def tone(n: Int): Array[Short] =
    Array.tabulate(n)(i => ((i * 97) % 4001 - 2000).toShort)

  test("encode/decode round-trips format and samples exactly") {
    val a = Wav.Audio(16000, 1, tone(300))
    val back = Wav.decode(Wav.encode(a))
    assert(back.sampleRate === 16000 && back.channels === 1)
    assert(back.samples.toSeq === a.samples.toSeq)
  }

  test("unknown chunks are skipped by declared size, odd sizes padded") {
    // odd-length junk exercises the RIFF pad byte; without honoring it
    // the 'data' id would be read one byte off and decode must fail
    val a = Wav.Audio(8000, 1, tone(7))
    val odd = Wav.decode(Wav.encode(a, Some(Array[Byte](1, 2, 3))))
    assert(odd.samples.toSeq === a.samples.toSeq)
    val even = Wav.decode(Wav.encode(a, Some(Array[Byte](1, 2, 3, 4))))
    assert(even.samples.toSeq === a.samples.toSeq)
  }

  test("negative samples survive the unsigned byte round-trip") {
    val a = Wav.Audio(8000, 2, Array[Short](-32768, -1, 0, 1, 32767, -2000))
    assert(Wav.decode(Wav.encode(a)).samples.toSeq === a.samples.toSeq)
  }

  test("200 random audios round-trip, with and without junk chunks") {
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { i =>
      val n = rng.nextInt(500)
      val a = Wav.Audio(1 + rng.nextInt(48000), 1 + rng.nextInt(4),
        Array.fill(n)((rng.nextInt(65536) - 32768).toShort))
      val junk = if (rng.nextBoolean())
        Some(Array.fill(rng.nextInt(33))(rng.nextInt(256).toByte))
      else None
      val back = Wav.decode(Wav.encode(a, junk))
      assert(back.sampleRate === a.sampleRate, s"case $i")
      assert(back.channels === a.channels, s"case $i")
      assert(back.samples.toSeq === a.samples.toSeq, s"case $i")
    }
  }

  test("malformed inputs throw instead of emitting garbage") {
    val ok = Wav.encode(Wav.Audio(8000, 1, tone(10)))
    // bad magic
    assertThrows[IllegalArgumentException](
      Wav.decode("RIFX".getBytes ++ ok.drop(4)))
    // declared chunk size overrunning the file
    val overrun = ok.clone()
    overrun(ok.length - 24) = 0x7f // corrupt a data-size byte upward
    assertThrows[IllegalArgumentException](Wav.decode(overrun))
    // missing data chunk: truncate right after fmt
    assertThrows[IllegalArgumentException](Wav.decode(ok.take(36)))
    // non-PCM format tag
    val floatTag = ok.clone()
    floatTag(20) = 3 // fmt tag lives at byte 20 in the canonical layout
    assertThrows[IllegalArgumentException](Wav.decode(floatTag))
    // 8-bit samples unsupported
    val eightBit = ok.clone()
    eightBit(34) = 8
    assertThrows[IllegalArgumentException](Wav.decode(eightBit))
  }
}
