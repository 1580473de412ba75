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

  private def fold(rows: Seq[(Long, Long, Long)]) =
    Multimodal.videoHashPairs(rows.toDF("doc_id", "frame_idx", "h"))
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
