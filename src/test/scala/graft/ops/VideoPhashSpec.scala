package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q185's video near-dup semantics — end-to-end on the planted AVI
  * table (pairs == within-group, frame counts from the construction
  * law) plus the two rules the frame-hash fold must enforce and the
  * image entry cannot test: TEMPORAL ALIGNMENT (identical hash sets at
  * shifted frame positions never pair) and the ALL-FRAMES count rule
  * (a strict-prefix match of a longer video never pairs).
  */
class VideoPhashSpec extends SparkSpec {
  import spark.implicits._

  // the fold takes the 128-bit (h0, h1) hash; the hamming-specific
  // cases plant all content in h0 with h1 pinned 0, so per-frame
  // distances are exactly the planted h0 bit differences
  private def fold(rows: Seq[(Long, Long, Long)]) =
    Multimodal.videoHashPairs(rows
        .map { case (d, f, h) => (d, f, h, 0L) }
        .toDF("doc_id", "frame_idx", "h0", "h1"))
      .select("doc_a", "doc_b", "n_frames", "max_hamming")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted

  test("aligned equal frame hashes pair; shifted ones do not") {
    val h = Seq(0x1111L, 0x2222L, 0x3333L)
    val aligned = Seq(
      (1L, 0L, h(0)), (1L, 2L, h(1)), (1L, 4L, h(2)),
      (2L, 0L, h(0)), (2L, 2L, h(1)), (2L, 4L, h(2)),
      // doc 3 carries the SAME hash multiset shifted one sample: a
      // montage re-using the frames out of position must NOT pair
      (3L, 0L, h(2)), (3L, 2L, h(0)), (3L, 4L, h(1)))
    assert(fold(aligned) === Seq((1L, 2L, 3L, 0L)))
  }

  test("a strict-prefix match of a longer video never pairs (count rule)") {
    val rows = Seq(
      (1L, 0L, 0xAAAAL), (1L, 2L, 0xBBBBL),
      (2L, 0L, 0xAAAAL), (2L, 2L, 0xBBBBL), (2L, 4L, 0xCCCCL))
    assert(fold(rows) === Seq.empty)
  }

  test("per-frame hamming <= 3 verifies; a single far frame kills the pair") {
    val near = Seq(
      (1L, 0L, 0xF0F0L), (1L, 2L, 0x0F0FL),
      (2L, 0L, 0xF0F1L), (2L, 2L, 0x0F0FL)) // frame 0 differs by 1 bit
    assert(fold(near) === Seq((1L, 2L, 2L, 1L)))
    val far = Seq(
      (1L, 0L, 0xF0F0L), (1L, 2L, 0x0F0FL),
      (2L, 0L, 0xF0F0L), (2L, 2L, 0x0F0F00FFL)) // frame 2 is far
    assert(fold(far) === Seq.empty)
  }

  // the containment fold takes the 128-bit (h0, h1) hash — plant both
  // words from independent mixes of the content key
  private def clipFold(rows: Seq[(Long, Long, Long)]) =
    Multimodal.clipHashPairs(rows
        .map { case (d, f, h) => (d, f, h, mix2(h)) }
        .toDF("doc_id", "frame_idx", "h0", "h1"))
      .select("doc_a", "doc_b", "delta", "n_aligned")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted

  private def mix2(x: Long): Long = {
    var k = (x + 0x1234567L) * 0xFF51AFD7ED558CCDL; k ^= k >>> 33
    k *= 0xC4CEB9FE1A85EC53L; k ^ (k >>> 33)
  }

  test("clip fold finds the offset; partial overlap is rejected") {
    def mix(x: Long): Long = {
      var k = x * 0x9E3779B97F4A7C15L; k ^= k >>> 31
      k *= 0xC2B2AE3D27D4EB4FL; k ^ (k >>> 29)
    }
    // source video 1: frames 0..5 with content hash mix(f);
    // doc 2 = clip of source frames 2..4, so its local frames 0..2
    // match at delta = -2 (fb - fa with a=1... a < b ⇒ a is the
    // SOURCE: clip local j matches source f = j+2 ⇒ delta = j-f = -2)
    val src = (0L until 6L).map(f => (1L, f, mix(f)))
    val clip = (0L until 3L).map(j => (2L, j, mix(j + 2)))
    assert(clipFold(src ++ clip) === Seq((1L, 2L, -2L, 3L)))
    // doc 3 overlaps source on only 2 of its 3 frames (frames 4,5 + a
    // foreign frame): below the shorter video's length — rejected
    val part = Seq((3L, 0L, mix(4)), (3L, 1L, mix(5)), (3L, 2L, mix(99)))
    assert(clipFold(src ++ part) === Seq.empty)
    // a STILL clip inside a source with a still RUN aligns at every
    // offset where the run covers it — the documented multi-delta
    // behavior, one row per valid alignment: a 2-frame still clip in
    // a 3-frame still run (source frames 1..3) fits at two offsets
    val runSrc = Seq((5L, 0L, mix(10)), (5L, 1L, mix(11)),
      (5L, 2L, mix(11)), (5L, 3L, mix(11)), (5L, 4L, mix(12)))
    val still = Seq((6L, 0L, mix(11)), (6L, 1L, mix(11)))
    assert(clipFold(runSrc ++ still) ===
      Seq((5L, 6L, -2L, 2L), (5L, 6L, -1L, 2L)))
  }

  test("end-to-end: planted AVI table pairs exactly within groups") {
    val dir = java.nio.file.Files.createTempDirectory("vphash").toString
    (0L until 16L).map(Tuple1(_)).toDF("doc_id")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.q185VideoPhashPairs(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val expected = (0L until 4L).flatMap { g =>
      val ids = (0 until 4).map(m => g * 4 + m)
      for (a <- ids; b <- ids if a < b)
        yield (a.toLong, b.toLong, (5 + g % 3) / 2, 0L, 0L)
    }.sorted
    assert(out === expected)
  }
}
