package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q191's scene-cut sampler — the production knob q186's scaladoc
  * named. Pins:
  *
  *  1. the sampled VOLUME: exactly frame 0 + the cut-adjacent pair at
  *     each scene boundary (7 of 12 frames for the full movies, 3 of
  *     6 for the 2-scene clips — a 44% hash/band/join volume cut on
  *     the planted table), which also certifies the exact-energy
  *     construction (a missed or spurious cut changes the counts);
  *  2. recall parity: the containment PAIR/DELTA set over sampled
  *     frames equals the all-frames fold on the same table — sampling
  *     changes n_aligned's meaning (sampled counts, not frame
  *     counts), never which pairs/offsets are found;
  *  3. the planted-law output itself (the oracle's arithmetic,
  *     re-derived here in Scala as an independent referee).
  */
class VideoCutSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("cut sampler keeps frame 0 + cut-adjacent frames only (7 of 12 / 3 of 6)") {
    val media = Multimodal.vcutAviTable(spark, dir)
    val counts = Multimodal.cutSampledFrameHashes(spark, media)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts.nonEmpty)
    counts.foreach { case (id, n) =>
      val want = if (id % 4 == 1 || id % 4 == 2) 3L else 7L
      assert(n === want, s"doc $id sampled $n, want $want")
    }
    // the volume drop the sampler buys on this table: 20/36 ≈ 0.56
    val total = counts.values.sum
    val allFrames = counts.keys.toSeq.map(id =>
      if (id % 4 == 1 || id % 4 == 2) 6L else 12L).sum
    assert(total * 9 === allFrames * 5, s"$total of $allFrames")
  }

  test("sampling preserves which containments are found, at which offsets") {
    val media = Multimodal.vcutAviTable(spark, dir).localCheckpoint()
    val sampledPairs = Multimodal.clipHashPairs(
        Multimodal.cutSampledFrameHashes(spark, media))
      .select(col("doc_a"), col("doc_b"), col("delta"))
      .as[(Long, Long, Long)].collect().toSet
    val allHashes = media.as[Multimodal.AviRow]
      .mapPartitions(_.flatMap { r =>
        Avi.decode(r.payload).frames.zipWithIndex.map { case (fb, f) =>
          val (h0, h1) =
            graft.functions.Phash.phash128(Multimodal.phashLuma(fb))
          (r.doc_id, f.toLong, h0, h1)
        }
      }).toDF("doc_id", "frame_idx", "h0", "h1")
    val allPairs = Multimodal.clipHashPairs(allHashes)
      .select(col("doc_a"), col("doc_b"), col("delta"))
      .as[(Long, Long, Long)].collect().toSet
    assert(sampledPairs === allPairs)
    assert(sampledPairs.nonEmpty)
  }

  test("q191 output equals the planted law end-to-end") {
    val got = graft.SparkEntry.queries("q191_video_cut_containment")(
        spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long].collect().toSet
    val rel = Seq((0L, 1L, -3L, 3L), (0L, 2L, -6L, 3L), (0L, 3L, 0L, 7L),
      (1L, 3L, 3L, 3L), (2L, 3L, 6L, 3L))
    val want = ids.toSeq.map(_ / 4).distinct.sorted.flatMap { c =>
      rel.collect { case (ma, mb, d, n)
          if ids(4 * c + ma) && ids(4 * c + mb) =>
        (4 * c + ma, 4 * c + mb, d, n, 0L, 0L)
      }
    }.sortBy(r => (r._1, r._2, r._3))
    assert(got === want)
  }
}
