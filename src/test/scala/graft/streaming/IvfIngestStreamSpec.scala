package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming IVF ingest == batch IVF ingest, on the real embeddings
  * table: train the coarse quantizer on the corpus split (vec_id % 10
  * ≠ 9, exactly q81's setup), stream the new split in 3 micro-batches
  * through [[EventStreams.ivfIngestStream]], and assert the resulting
  * staged index equals the index q81 stages in ONE batch pass —
  * row-for-row. Both paths assign through the same broadcast-centroid
  * expression over the same trained codebook, so any divergence would
  * be a streaming-plumbing bug (batch boundaries, append semantics,
  * checkpoint replay), which is precisely what the spec exists to
  * catch. Also asserts idempotence: a drained AvailableNow re-run with
  * the same checkpoint appends nothing.
  */
class IvfIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream-ingested index equals q81's batch-ingested index over 3 micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val staged =
      java.nio.file.Files.createTempDirectory("ivf-stream").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("ivf-stream-ckpt").toString

    val isNew = col("vec_id") % 10 === 9
    val ivAll = Similarity.scaledVectors(spark, dir)
      .where(col("nrm") > 0)
      .select(col("vec_id"), col("v"), col("nrm"))
      .localCheckpoint()
    // same training call as q81: corpus split only, k=4, 5 Lloyd rounds
    val (centroids, corpusCells) =
      Similarity.trainCodebookOn(ivAll.where(!isNew), k = 4, iters = 5)
    // the pre-existing index: corpus assignments staged batch-side
    corpusCells.write.mode("overwrite").parquet(s"$staged/cells_stream")

    val newRows = ivAll.where(isNew)
      .as[(Long, Seq[Long], Double)].collect().toSeq.sortBy(_._1)
    assert(newRows.size >= 3, s"need >=3 new vectors, got ${newRows.size}")
    val src = MemoryStream[(Long, Seq[Long], Double)]
    def drain(): Unit =
      EventStreams.ivfIngestStream(
        src.toDF().toDF("vec_id", "v", "nrm"), centroids, staged, ckpt)
        .awaitTermination() // AvailableNow: runs until drained
    newRows.grouped((newRows.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain()
    }

    val streamed = spark.read.parquet(s"$staged/cells_stream")
      .as[(Long, Long)].collect().toSet
    // batch reference: q81 stages cells_ingest (corpus ∪ new) itself
    Similarity.q81AnnIvfIngest(spark, dir).collect()
    val batch = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/cells_ingest")
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size > corpusCells.count().toInt,
      "stream must have appended the new split")

    // exactly-once: a drained re-run with the same checkpoint is a no-op
    drain()
    val again = spark.read.parquet(s"$staged/cells_stream").count()
    assert(again === streamed.size.toLong)

    // at-least-once redelivery: the SAME rows through a FRESH
    // checkpoint (the offset log forgets them, as after a crash
    // between write and commit) must also be a no-op — the
    // anti-join-by-content, not the checkpoint, carries idempotence
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("ivf-stream-ckpt2").toString
    val src2 = MemoryStream[(Long, Seq[Long], Double)]
    src2.addData(newRows: _*)
    EventStreams.ivfIngestStream(
      src2.toDF().toDF("vec_id", "v", "nrm"), centroids, staged, ckpt2)
      .awaitTermination()
    assert(spark.read.parquet(s"$staged/cells_stream").count()
      === streamed.size.toLong)
  }

  test("in-batch redelivery: a vec_id duplicated WITHIN one micro-batch appends once") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val staged =
      java.nio.file.Files.createTempDirectory("ivf-dupb").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("ivf-dupb-ckpt").toString
    val isNew = col("vec_id") % 10 === 9
    val ivAll = Similarity.scaledVectors(spark, dir)
      .where(col("nrm") > 0)
      .select(col("vec_id"), col("v"), col("nrm"))
      .localCheckpoint()
    val (centroids, _) =
      Similarity.trainCodebookOn(ivAll.where(!isNew), k = 4, iters = 5)
    val newRows = ivAll.where(isNew)
      .as[(Long, Seq[Long], Double)].collect().toSeq.sortBy(_._1)
    // an at-least-once source redelivering INSIDE one batch: every
    // row arrives 3 times in the same micro-batch — the staged-table
    // anti-join can't see these (nothing is staged yet), so only the
    // in-batch dropDuplicates stands between this and 3× rows
    val src = MemoryStream[(Long, Seq[Long], Double)]
    src.addData(newRows ++ newRows ++ newRows: _*)
    EventStreams.ivfIngestStream(
      src.toDF().toDF("vec_id", "v", "nrm"), centroids, staged, ckpt)
      .awaitTermination()
    val got = spark.read.parquet(s"$staged/cells_stream")
    assert(got.count() === newRows.size.toLong, "one row per vec_id")
    assert(got.groupBy(col("vec_id")).count()
      .where(col("count") > 1).count() === 0L)
  }
}
