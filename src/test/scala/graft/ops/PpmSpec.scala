package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class PpmSpec extends AnyFunSuite {
  private def raster(n: Int): Array[Byte] =
    Array.tabulate(n)(i => (i % 256).toByte)

  test("encode/decode round-trips header and raster byte-for-byte") {
    val img = Ppm.Image(5, 3, 255, raster(45))
    val back = Ppm.decode(Ppm.encode(img))
    assert(back.width === 5 && back.height === 3 && back.maxval === 255)
    assert(back.pixels.toSeq === img.pixels.toSeq)
  }

  test("decoder accepts the format's real grammar, not just our encoder's") {
    // comments between any header tokens, mixed whitespace, CR/LF
    val hdr = "P6 # a comment\n # another\n 2\t1 # dims\r\n255\n"
    val bytes = hdr.getBytes("US-ASCII") ++ raster(6)
    val img = Ppm.decode(bytes)
    assert(img.width === 2 && img.height === 1 && img.maxval === 255)
    assert(img.pixels.toSeq === raster(6).toSeq)
  }

  test("exactly one whitespace byte separates maxval from the raster") {
    // raster starting with a whitespace-valued byte (0x20) must NOT be
    // eaten: the single separator rule is what makes that unambiguous
    val bytes = "P6\n1 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](' ', 'x', 'y')
    assert(Ppm.decode(bytes).pixels.toSeq === Seq[Byte](' ', 'x', 'y'))
  }

  test("malformed inputs throw instead of emitting garbage") {
    val ok = Ppm.encode(Ppm.Image(2, 2, 255, raster(12)))
    assertThrows[IllegalArgumentException](Ppm.decode("P5\n1 1\n255\n".getBytes ++ raster(3)))
    assertThrows[IllegalArgumentException](Ppm.decode(ok.dropRight(1))) // truncated raster
    assertThrows[IllegalArgumentException](Ppm.decode("P6\n0 1\n255\n".getBytes ++ raster(0))) // zero dim
    assertThrows[IllegalArgumentException](Ppm.decode("P6\nx 1\n255\n".getBytes ++ raster(3))) // bad int
    assertThrows[IllegalArgumentException](Ppm.decode("P6\n1 1\n999\n".getBytes ++ raster(3))) // wide samples
    // adversarial dims whose raster size overflows Int must hit the
    // guard, not a copyOfRange artifact
    assertThrows[IllegalArgumentException](Ppm.decode("P6\n50000 50000\n255\n".getBytes ++ raster(3)))
  }
}
