package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming PQ encode == batch PQ ingest, on the real embeddings
  * table: train the PQ codebook on the corpus split (vec_id % 10 ≠ 9,
  * exactly q93's setup), stream the new split in 3 micro-batches
  * through [[EventStreams.pqIngestStream]], and assert the resulting
  * staged code table equals the `pq_codes_ingest` table q93 stages in
  * one batch pass — row-for-row. Both paths encode through the same
  * broadcast-codebook argmin over the same trained codebook, so any
  * divergence is streaming plumbing. Plus drained-re-run idempotence.
  */
class PqIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream-encoded codes equal q93's batch-ingested codes over 3 micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val staged =
      java.nio.file.Files.createTempDirectory("pq-stream").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("pq-stream-ckpt").toString

    val isNew = col("vec_id") % 10 === 9
    val ivAll = Similarity.scaledVectors(spark, dir)
      .select(col("vec_id"), col("v")).localCheckpoint()
    // same training call as q93: corpus split only
    val (codebook, corpusCodes) = Similarity.trainPq(ivAll.where(!isNew))
    corpusCodes.select(col("vec_id"), col("sub"), col("code"))
      .write.mode("overwrite").parquet(s"$staged/pq_codes_stream")

    val newRows = ivAll.where(isNew)
      .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    assert(newRows.size >= 3, s"need >=3 new vectors, got ${newRows.size}")
    val src = MemoryStream[(Long, Seq[Long])]
    def drain(): Unit =
      EventStreams.pqIngestStream(
        src.toDF().toDF("vec_id", "v"), codebook, staged, ckpt)
        .awaitTermination()
    newRows.grouped((newRows.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain()
    }

    val streamed = spark.read.parquet(s"$staged/pq_codes_stream")
      .as[(Long, Int, Int)].collect().toSet
    // batch reference: q93 stages pq_codes_ingest itself
    Similarity.q93PqIngest(spark, dir).collect()
    val batch = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/pq_codes_ingest")
      .as[(Long, Int, Int)].collect().toSet
    assert(streamed === batch)

    // exactly-once: drained re-run appends nothing
    drain()
    assert(spark.read.parquet(s"$staged/pq_codes_stream").count()
      === streamed.size.toLong)

    // at-least-once redelivery: same rows, FRESH checkpoint — the
    // anti-join by content must no-op the replay
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("pq-stream-ckpt2").toString
    val src2 = MemoryStream[(Long, Seq[Long])]
    src2.addData(newRows: _*)
    EventStreams.pqIngestStream(
      src2.toDF().toDF("vec_id", "v"), codebook, staged, ckpt2)
      .awaitTermination()
    assert(spark.read.parquet(s"$staged/pq_codes_stream").count()
      === streamed.size.toLong)
  }

  test("in-batch redelivery: a vec_id duplicated WITHIN one micro-batch encodes once") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val staged =
      java.nio.file.Files.createTempDirectory("pq-dupb").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("pq-dupb-ckpt").toString
    val isNew = col("vec_id") % 10 === 9
    val ivAll = Similarity.scaledVectors(spark, dir)
      .select(col("vec_id"), col("v")).localCheckpoint()
    val (codebook, _) = Similarity.trainPq(ivAll.where(!isNew))
    val newRows = ivAll.where(isNew)
      .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    // 3 copies of every row in ONE batch: nothing is staged yet, so
    // the anti-join is blind — in-batch dedup must carry it alone
    val src = MemoryStream[(Long, Seq[Long])]
    src.addData(newRows ++ newRows ++ newRows: _*)
    EventStreams.pqIngestStream(
      src.toDF().toDF("vec_id", "v"), codebook, staged, ckpt)
      .awaitTermination()
    val got = spark.read.parquet(s"$staged/pq_codes_stream")
    assert(got.count()
      === newRows.size.toLong * Similarity.PqSubspaces)
    assert(got.groupBy(col("vec_id"), col("sub")).count()
      .where(col("count") > 1).count() === 0L)
  }
}
