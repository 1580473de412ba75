package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The round-16 arrival-independence contract, pinned: for each
  * ingest log that folds redeliveries (pack counts, video frame
  * hashes, k-NN vectors), a CONFLICTING feed — the same key delivered
  * twice with different content, the feed-bug case where the old
  * first-write-wins rule's survivor depended on where the batch
  * boundary fell — resolves to IDENTICAL log content under two
  * different batchings: everything in one batch vs the conflict split
  * across batches. The mechanism: appends are content-keyed (exact
  * replays drop, conflicts append), and every consumer reads through
  * the per-key MAX resolver that equals the in-batch fold.
  */
class IngestRebatchSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("pack counts: conflicting feed resolves identically under two batchings") {
    implicit val sqlCtx = spark.sqlContext
    // doc 1 delivered with 3 tokens, then redelivered with 5
    val d3 = (1L, "a b c")
    val d5 = (1L, "a b c d e")
    val other = (2L, "x y")
    def run(batches: Seq[Seq[(Long, String)]]): Seq[(Long, Long)] = {
      val staged = tmp("rebatch-pack")
      val ckpt = tmp("rebatch-pack-ckpt")
      val src = MemoryStream[(Long, String)]
      batches.foreach { b =>
        src.addData(b: _*)
        EventStreams.packIngestStream(
          src.toDF().toDF("doc_id", "text"), staged, ckpt)
          .awaitTermination()
      }
      EventStreams.resolvedPackCounts(spark, staged)
        .as[(Long, Long)].collect().toSeq.sorted
    }
    val together = run(Seq(Seq(d3, d5, other)))
    val split = run(Seq(Seq(d3, other), Seq(d5)))
    val splitReversed = run(Seq(Seq(d5, other), Seq(d3)))
    assert(together === split && split === splitReversed,
      s"$together / $split / $splitReversed")
    assert(together === Seq((1L, 5L), (2L, 2L)),
      "the resolve is the per-key MAX over every delivery")
  }

  test("frame hashes: conflicting feed resolves identically under two batchings") {
    implicit val sqlCtx = spark.sqlContext
    val r1 = (7L, 0L, 100L, 200L)
    val r1conf = (7L, 0L, 300L, 50L) // same (doc, frame), new hash
    val other = (8L, 0L, 21L, 22L)
    def run(batches: Seq[Seq[(Long, Long, Long, Long)]]) = {
      val staged = tmp("rebatch-vhash")
      val ckpt = tmp("rebatch-vhash-ckpt")
      val src = MemoryStream[(Long, Long, Long, Long)]
      batches.foreach { b =>
        src.addData(b: _*)
        EventStreams.videoHashIngestStream(
          src.toDF().toDF("doc_id", "frame_idx", "h0", "h1"),
          staged, ckpt).awaitTermination()
      }
      EventStreams.resolvedFrameHashLog(spark, staged)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    }
    val together = run(Seq(Seq(r1, r1conf, other)))
    val split = run(Seq(Seq(r1, other), Seq(r1conf)))
    val splitReversed = run(Seq(Seq(r1conf, other), Seq(r1)))
    assert(together === split && split === splitReversed,
      s"$together / $split / $splitReversed")
    // lexicographic MAX over (h0, h1): (300, 50) wins
    assert(together === Seq((7L, 0L, 300L, 50L), other).sorted)
  }

  test("knn vectors: conflicting feed derives the same graph input under two batchings") {
    implicit val sqlCtx = spark.sqlContext
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val v1 = (1L, Seq(10L, 0L))
    val v1conf = (1L, Seq(0L, 10L)) // conflicting vector — flips cell
    val other = (2L, Seq(3L, 4L))
    def run(batches: Seq[Seq[(Long, Seq[Long])]]) = {
      val staged = tmp("rebatch-knn")
      val ckpt = tmp("rebatch-knn-ckpt")
      val src = MemoryStream[(Long, Seq[Long])]
      batches.foreach { b =>
        src.addData(b: _*)
        EventStreams.knnGraphIngestStream(
          src.toDF().toDF("vec_id", "v"), cents, staged, ckpt)
          .awaitTermination()
      }
      EventStreams.resolvedKnnVectorLog(spark, staged)
        .select(col("vec_id"), col("cluster"), col("v"))
        .as[(Long, Int, Seq[Long])].collect().toSeq.sortBy(_._1)
    }
    val together = run(Seq(Seq(v1, v1conf, other)))
    val split = run(Seq(Seq(v1, other), Seq(v1conf)))
    val splitReversed = run(Seq(Seq(v1conf, other), Seq(v1)))
    assert(together === split && split === splitReversed,
      s"$together / $split / $splitReversed")
    // MAX(v) lexicographic: [10, 0] > [0, 10] — and the winning row
    // carries ITS OWN cluster (cell 0), never the loser's
    assert(together.head === ((1L, 0, Seq(10L, 0L))))
  }
}
