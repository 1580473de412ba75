package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming cluster-balanced sampling == batch q163 election, on the
  * real embeddings table: train the coarse quantizer once, stream the
  * corpus in 3 micro-batches through
  * [[EventStreams.clusterSampleStream]], and assert the streamed
  * sample equals the ONE-pass batch election over the same assignment
  * — row-for-row, rank-for-rank. Both paths elect through
  * Similarity.clusterSampleElect, so a divergence would be a
  * streaming-plumbing bug (fold ordering, overwrite semantics,
  * checkpoint replay) — and the fold itself is only correct because
  * bottom-k by a total key order is an insert-monotone monoid, which
  * is precisely what streaming in thirds exercises.
  *
  * Idempotence modes: drained re-run (same checkpoint), fresh-
  * checkpoint full redelivery, and the mode unique to an EVICTING
  * state — redelivery of a row the sample already evicted, which must
  * re-lose the same election.
  */
class ClusterSampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed sample equals the batch election over 3 micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val staged =
      java.nio.file.Files.createTempDirectory("csample-stream").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("csample-ckpt").toString

    val ivAll = Similarity.scaledVectors(spark, dir)
      .where(col("nrm") > 0)
      .select(col("vec_id"), col("label"), col("v"), col("nrm"))
      .localCheckpoint()
    val (centroids, corpusCells) = Similarity.trainCodebookOn(
      ivAll.select(col("vec_id"), col("v"), col("nrm")), k = 4, iters = 5)

    // the batch reference: one-pass election over the full assignment
    val batchSample = Similarity.clusterSampleElect(
      ivAll.select(col("vec_id"), col("label")).join(corpusCells, "vec_id"))
      .as[(Int, Int, Long, Int, Long)].collect().toSeq

    val rows = ivAll.select(col("vec_id"), col("label"), col("v"), col("nrm"))
      .as[(Long, Int, Seq[Long], Double)].collect().toSeq.sortBy(_._1)
    assert(rows.size >= 3)
    val src = MemoryStream[(Long, Int, Seq[Long], Double)]
    def drain(): Unit =
      EventStreams.clusterSampleStream(
        src.toDF().toDF("vec_id", "label", "v", "nrm"),
        centroids, staged, ckpt).awaitTermination()
    rows.grouped((rows.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain()
    }

    val streamed = EventStreams.streamedClusterSampleView(spark, staged)
      .as[(Int, Int, Long, Int, Long)].collect().toSeq
    assert(streamed === batchSample)

    // state is model-sized: the staged table holds at most cells×quota
    val stateRows = spark.read.parquet(s"$staged/sample_stream").count()
    assert(stateRows <= 4L * Similarity.ClusterSampleQuota)
    assert(stateRows < rows.size.toLong,
      "the sample must be a strict subset of the corpus")

    // drained re-run with the same checkpoint: a no-op
    drain()
    assert(EventStreams.streamedClusterSampleView(spark, staged)
      .as[(Int, Int, Long, Int, Long)].collect().toSeq === batchSample)

    // fresh-checkpoint full redelivery: the offset log forgets, the
    // election's determinism (not the checkpoint) carries idempotence
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("csample-ckpt2").toString
    val src2 = MemoryStream[(Long, Int, Seq[Long], Double)]
    src2.addData(rows: _*)
    EventStreams.clusterSampleStream(
      src2.toDF().toDF("vec_id", "label", "v", "nrm"),
      centroids, staged, ckpt2).awaitTermination()
    assert(EventStreams.streamedClusterSampleView(spark, staged)
      .as[(Int, Int, Long, Int, Long)].collect().toSeq === batchSample)

    // the evicting-state mode: re-offer ONLY rows the sample evicted —
    // every current member still beats them by key, so they re-lose
    val keptIds = batchSample.map(_._3).toSet
    val evicted = rows.filterNot(r => keptIds.contains(r._1))
    assert(evicted.nonEmpty, "need at least one evicted row")
    val ckpt3 =
      java.nio.file.Files.createTempDirectory("csample-ckpt3").toString
    val src3 = MemoryStream[(Long, Int, Seq[Long], Double)]
    src3.addData(evicted: _*)
    EventStreams.clusterSampleStream(
      src3.toDF().toDF("vec_id", "label", "v", "nrm"),
      centroids, staged, ckpt3).awaitTermination()
    assert(EventStreams.streamedClusterSampleView(spark, staged)
      .as[(Int, Int, Long, Int, Long)].collect().toSeq === batchSample)
  }

  test("in-batch redelivery: a vec_id duplicated WITHIN one micro-batch counts once") {
    implicit val sqlCtx = spark.sqlContext
    val staged =
      java.nio.file.Files.createTempDirectory("csample-dupb").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("csample-dupb-ckpt").toString
    val ivAll = Similarity.scaledVectors(spark, dir)
      .where(col("nrm") > 0)
      .select(col("vec_id"), col("label"), col("v"), col("nrm"))
      .localCheckpoint()
    val (centroids, _) = Similarity.trainCodebookOn(
      ivAll.select(col("vec_id"), col("v"), col("nrm")), k = 4, iters = 5)
    val rows = ivAll.as[(Long, Int, Seq[Long], Double)].collect().toSeq
      .sortBy(_._1).take(5)
    val src = MemoryStream[(Long, Int, Seq[Long], Double)]
    src.addData(rows ++ rows.take(2): _*) // 2 in-batch duplicates
    EventStreams.clusterSampleStream(
      src.toDF().toDF("vec_id", "label", "v", "nrm"),
      centroids, staged, ckpt).awaitTermination()
    val state = spark.read.parquet(s"$staged/sample_stream")
      .as[(Int, Long, Int)].collect().toSeq
    assert(state.map(_._2).distinct.size === state.size,
      "a duplicated vec_id entered the sample twice")
    assert(state.map(_._2).toSet.subsetOf(rows.map(_._1).toSet),
      "the sample invented a vec_id")
  }
}
