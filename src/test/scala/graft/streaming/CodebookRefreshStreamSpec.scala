package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming codebook refresh == batch q161, on the real embeddings
  * table: stage the corpus sufficient statistics (the same
  * stageCodebookSums call q161 guards on), stream the new split
  * (vec_id % 10 == 9) in 3 micro-batches — the FIRST with an in-batch
  * duplicate — through [[EventStreams.codebookRefreshStream]], and
  * assert the streamed view equals q161's batch refresh row-for-row.
  * Both paths assign through the same broadcast-centroid expression
  * and merge through the same batchSumsOf/mergedCodebook pair, so a
  * divergence would be streaming plumbing (double-counted sums being
  * the failure mode this log-append design exists to prevent). Also
  * pins both idempotence modes: a drained AvailableNow re-run and a
  * fresh-checkpoint full redelivery each append nothing and leave the
  * refreshed centroids byte-identical.
  */
class CodebookRefreshStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed codebook refresh equals batch q161; redelivery never double-counts") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val staged =
      java.nio.file.Files.createTempDirectory("cb-stream").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("cb-stream-ckpt").toString

    // stage the corpus half exactly as q161 does (deterministic
    // training: same call, same split, same seeds)
    Similarity.stageCodebookSums(spark, dir, staged)
    val isNew = col("vec_id") % 10 === 9
    val ivAll = Similarity.scaledVectors(spark, dir)
      .where(col("nrm") > 0)
      .select(col("vec_id"), col("v"), col("nrm"))
      .localCheckpoint()
    val (centroids, _) =
      Similarity.trainCodebookOn(ivAll.where(!isNew), k = 4, iters = 5)

    val newRows = ivAll.where(isNew)
      .as[(Long, Seq[Long], Double)].collect().toSeq.sortBy(_._1)
    assert(newRows.size >= 3, s"need >=3 new vectors, got ${newRows.size}")
    val src = MemoryStream[(Long, Seq[Long], Double)]
    def drain(): Unit =
      EventStreams.codebookRefreshStream(
        src.toDF().toDF("vec_id", "v", "nrm"), centroids, staged, ckpt)
        .awaitTermination()
    val chunks = newRows.grouped((newRows.size + 2) / 3).toSeq
    // in-batch redelivery: duplicate the first chunk's first row
    src.addData(chunks.head.head +: chunks.head: _*)
    drain()
    chunks.tail.foreach { chunk => src.addData(chunk: _*); drain() }

    def view(): Seq[(Int, Int, Double, Long)] =
      EventStreams.streamedCodebookView(spark, staged)
        .as[(Int, Int, Double, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
    val streamed = view()
    val batch = Similarity.q161CodebookRefresh(spark, dir)
      .as[(Int, Int, Double, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(streamed === batch)
    assert(spark.read.parquet(s"$staged/cb_log").count()
      === newRows.size.toLong, "log must hold each new vector once")

    // drained re-run: no-op
    drain()
    assert(view() === streamed)

    // fresh-checkpoint full redelivery: the anti-join-by-content, not
    // the offset log, carries idempotence — sums must not double
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("cb-stream-ckpt2").toString
    val src2 = MemoryStream[(Long, Seq[Long], Double)]
    src2.addData(newRows: _*)
    EventStreams.codebookRefreshStream(
      src2.toDF().toDF("vec_id", "v", "nrm"), centroids, staged, ckpt2)
      .awaitTermination()
    assert(view() === streamed)
    assert(spark.read.parquet(s"$staged/cb_log").count()
      === newRows.size.toLong)
  }
}
