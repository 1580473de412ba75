package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming tombstone-masked serving == batch q144, on the real
  * embeddings — the CONSTRAINTS column of the serving-stream matrix:
  * run the batch entry once (stages the flat index + the delete
  * feed), then stream the SAME 20 query vectors — including the
  * DELETED ones (vec_id % 7 == 3) — in 3 micro-batches through
  * [[EventStreams.tombstoneSearchStream]] and assert the accumulated
  * result log equals the batch result row-for-row. The deleted query
  * ids must append NOTHING (the serving contract: a tombstoned
  * requester is masked, not served), which the batch/stream equality
  * covers and one explicit assertion pins. Also pins the
  * effectively-once guard under a drained re-run.
  */
class TombstoneSearchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed masked search equals batch q144; deleted query ids append nothing") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val work = Dedup.stageRoot(dir)
    val ckpt =
      java.nio.file.Files.createTempDirectory("tomb-srch-ckpt").toString

    // batch reference; stages the flat index + delete feed
    val batch = Similarity.q144TombstoneAnn(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(batch.nonEmpty)
    val fs = new org.apache.hadoop.fs.Path(s"$work/tombstone_results_stream")
    fs.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fs, true)

    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val (centroids, _) =
      Similarity.trainCodebook(spark, dir, k = Similarity.adaptiveCellCount(n))

    // stream ALL vec_id < 20 queries, deleted ones included — the
    // stream must mask them, not serve them
    val qRows = Similarity.scaledVectors(spark, dir)
      .where(col("nrm") > 0).where(col("vec_id") < 20)
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Long], Double)].collect().toSeq.sortBy(_._1)
    assert(qRows.exists(_._1 % 7 == 3), "need a deleted query in the feed")
    val src = MemoryStream[(Long, Seq[Long], Double)]
    def drain(): Unit =
      EventStreams.tombstoneSearchStream(
        src.toDF().toDF("vec_id", "v", "nrm"), dir, work, centroids,
        nprobe = 2, ckpt).awaitTermination()
    qRows.grouped((qRows.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain()
    }

    val streamed = spark.read.parquet(s"$work/tombstone_results_stream")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(streamed === batch,
      s"streamed ${streamed.size} rows != batch ${batch.size}")
    assert(!streamed.exists(_._1 % 7 == 3),
      "a deleted query id was served")
    assert(!streamed.exists(_._3 % 7 == 3),
      "a deleted corpus row was served as a neighbor")

    // drained re-run: no-op
    drain()
    assert(spark.read.parquet(s"$work/tombstone_results_stream").count()
      === batch.size.toLong)
  }
}
