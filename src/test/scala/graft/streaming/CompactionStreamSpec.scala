package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, Similarity, Staged}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming compaction == batch compaction: the delete feed q154
  * consumes in ONE batch anti-join is streamed through
  * [[EventStreams.compactionStream]] in 3 micro-batches (each id
  * redelivered 3× in-batch, then the full feed replayed through a
  * fresh checkpoint), and the incrementally-folded index must equal
  * the batch `cells_compact` row-for-row — the anti-join algebra
  * (A ∖ D₁) ∖ D₂ = A ∖ (D₁ ∪ D₂) made a pinned fact, so trigger
  * pacing (per-batch here, report-paced in production) provably
  * cannot change the compacted index.
  */
class CompactionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-micro-batch folds reach the batch-compacted index; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val work = Dedup.stageRoot(dir)
    val staged =
      java.nio.file.Files.createTempDirectory("cmp-stream").toString

    // batch side: q154 stages cells_compact (= cells ∖ deletes)
    Similarity.q154CompactedSearch(spark, dir).collect()
    val batchCompact = spark.read.parquet(s"$work/cells_compact")
    val ids = spark.read.parquet(s"$work/deletes")
      .as[Long].collect().toSeq.sorted

    // streamed side: same feed, 3 micro-batches, 3× in-batch redelivery
    val src = MemoryStream[Long]
    def drain(cp: String, s: MemoryStream[Long]): Unit =
      EventStreams.compactionStream(s.toDF().toDF("vec_id"),
        s"$work/cells", staged, cp).awaitTermination()
    val ckpt = java.nio.file.Files.createTempDirectory("cmp-ckpt").toString
    ids.grouped((ids.size + 2) / 3).foreach { chunk =>
      src.addData(chunk ++ chunk ++ chunk: _*)
      drain(ckpt, src)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cluster")).as[(Long, Long)]
        .collect().toSet
    val streamed = spark.read.parquet(s"$staged/cells_compact_stream")
    assert(rows(streamed) === rows(batchCompact),
      "incremental folds diverged from the batch compaction")
    assert(streamed.count() === batchCompact.count())
    // the consumed-feed log carries each id exactly once
    val feed = spark.read.parquet(s"$staged/deletes_compacted_stream")
    assert(feed.as[Long].collect().toSeq.sorted === ids)

    // full replay through a FRESH checkpoint (offset log forgotten):
    // content-keying must keep both the index and the feed unchanged
    val src2 = MemoryStream[Long]
    src2.addData(ids: _*)
    drain(java.nio.file.Files.createTempDirectory("cmp-ckpt2").toString,
      src2)
    assert(rows(spark.read.parquet(s"$staged/cells_compact_stream"))
      === rows(batchCompact))
    assert(spark.read.parquet(s"$staged/deletes_compacted_stream").count()
      === ids.size.toLong)
  }
}
