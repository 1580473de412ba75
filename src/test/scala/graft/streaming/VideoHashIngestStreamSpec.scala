package graft.streaming

import graft.SparkSpec
import graft.ops.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed video frame-hash ingest == the batch q185 pair set
  * ([[EventStreams.videoHashIngestStream]] folds (doc_id, frame_idx,
  * h0, h1) rows into a durable log; [[Multimodal.videoHashPairs]]
  * over the resolved log must equal the batch derivation row-for-row
  * — the packing twin's contract: the log is insert-monotone, pairs
  * are a deterministic function of it). Pins TORN-VIDEO healing (a
  * batch delivering only half a video's frames, completed later — the
  * all-frames rule means the pair appears only once the video is
  * whole), plus the standard drained re-run and fresh-checkpoint
  * redelivery no-ops, that the ONE 128-bit log serves both video
  * folds (q185's position-keyed fold and q186's offset-free
  * containment fold), and the schema guard on a legacy 64-bit log.
  */
class VideoHashIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed frame-hash log derives the batch pair set; torn videos heal") {
    implicit val sqlCtx = spark.sqlContext
    // two dup groups of 3 videos (aligned equal hashes per frame) and
    // two singletons; 3 sampled frames per video. Hashes are splitmix-
    // scrambled per (group, frame) — naive near constants (0x1000 vs
    // 0x2000 is Hamming 2) would CROSS-match groups through the d ≤ 3
    // verify, which is exactly what the scramble prevents
    def mix(x: Long): Long = {
      var k = x * 0x9E3779B97F4A7C15L; k ^= k >>> 31
      k *= 0xC2B2AE3D27D4EB4FL; k ^ (k >>> 29)
    }
    // one delivered row = the frame's 128-bit hash, as the
    // one-decode-pass upstream map emits it
    def row(id: Long, f: Long, key: Long): (Long, Long, Long, Long) =
      (id, f, mix(key + 7000), mix(key + 9000))
    val rows: Seq[(Long, Long, Long, Long)] =
      (for (g <- 0 until 2; m <- 0 until 3; f <- 0 until 3) yield
        row((g * 10 + m).toLong, f.toLong * 2, g.toLong * 100 + f)) ++
        (for (j <- 0 until 2; f <- 0 until 3)
          yield row((100 + j).toLong, f.toLong * 2, 1000L + j * 10 + f))
    val batch = Multimodal.videoHashPairs(
        rows.toDF("doc_id", "frame_idx", "h0", "h1"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(batch.size === 2 * 3) // C(3,2) per group

    val staged =
      java.nio.file.Files.createTempDirectory("vhash-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vhash-ckpt").toString
    val src = MemoryStream[(Long, Long, Long, Long)]
    def drain(ck: String,
        st: MemoryStream[(Long, Long, Long, Long)]): Unit =
      EventStreams.videoHashIngestStream(
        st.toDF().toDF("doc_id", "frame_idx", "h0", "h1"), staged, ck)
        .awaitTermination()
    def resolved() = EventStreams.resolvedFrameHashLog(spark, staged)
    def derived(): Seq[(Long, Long, Long, Long, Long)] =
      Multimodal.videoHashPairs(
          resolved().select("doc_id", "frame_idx", "h0", "h1"))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted

    // batch 1: doc 0 arrives TORN (frames 0,2 only) with doc 1 whole
    val (doc0, rest) = rows.partition(_._1 == 0L)
    src.addData(doc0.take(2) ++ rest.filter(_._1 == 1L): _*)
    drain(ckpt, src)
    // 0 is torn (2 of 3 frames): the all-frames rule admits no pair yet
    assert(derived() === Seq.empty)
    // batch 2: doc 0 completes (with an in-batch replay of a logged
    // frame) + everything else arrives
    src.addData(doc0 ++ rest.filterNot(_._1 == 1L): _*)
    drain(ckpt, src)
    assert(derived() === batch)

    // drained re-run: no-op
    drain(ckpt, src)
    assert(derived() === batch)

    // fresh-checkpoint full redelivery: absorbed per (doc, frame)
    val ckpt2 = java.nio.file.Files.createTempDirectory("vhash-ckpt2").toString
    val src2 = MemoryStream[(Long, Long, Long, Long)]
    src2.addData(rows: _*)
    drain(ckpt2, src2)
    assert(derived() === batch)
    assert(spark.read.parquet(s"$staged/video_frame_hashes").count()
      === rows.size.toLong, "log must stay one row per (doc, frame)")

    // the SAME log serves the q186 clip fold — one ingest twin, two
    // derivations (position-keyed re-encode pairs, offset-free clip
    // containments), one 128-bit hash family
    def clips(df: org.apache.spark.sql.DataFrame) =
      Multimodal.clipHashPairs(df)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(clips(resolved()
        .select(col("doc_id"), col("frame_idx"), col("h0"), col("h1")))
      === clips(rows.toDF("doc_id", "frame_idx", "h0", "h1")))
  }

  test("a legacy 64-bit log fails the read by name, not with a plan error") {
    implicit val sqlCtx = spark.sqlContext
    val staged =
      java.nio.file.Files.createTempDirectory("vhash-legacy").toString
    // a log written by the retired (doc_id, frame_idx, h) schema
    Seq((1L, 0L, 42L)).toDF("doc_id", "frame_idx", "h")
      .write.parquet(s"$staged/video_frame_hashes")
    val e = intercept[IllegalArgumentException](
      EventStreams.resolvedFrameHashLog(spark, staged).collect())
    assert(e.getMessage.contains("128-bit") &&
      e.getMessage.contains("re-run the ingest"), e.getMessage)
    // the ingest sink trips the same guard instead of appending a
    // mixed-schema log
    val ckpt = java.nio.file.Files.createTempDirectory("vhash-lckpt").toString
    val src = MemoryStream[(Long, Long, Long, Long)]
    src.addData((1L, 0L, 7L, 9L))
    val q = EventStreams.videoHashIngestStream(
      src.toDF().toDF("doc_id", "frame_idx", "h0", "h1"), staged, ckpt)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    assert(err.getMessage.contains("128-bit") ||
      Option(err.getCause).exists(_.getMessage.contains("128-bit")),
      err.getMessage)
  }
}
