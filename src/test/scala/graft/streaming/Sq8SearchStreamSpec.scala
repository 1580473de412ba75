package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming SQ8 serving == batch q167, on the real embeddings: run
  * the batch entry once (stages the flat cells + probes and the SQ8
  * params/codes), then stream the SAME 20 query vectors in 3
  * micro-batches through [[EventStreams.sq8SearchStream]] at the
  * staged nprobe and assert the accumulated result log equals the
  * batch result row-for-row. Both paths run Similarity.sq8SearchOn
  * over the same staged tables, so any divergence is streaming
  * plumbing. Also pins the effectively-once guard: a drained re-run
  * and a redelivery through a fresh checkpoint both append nothing.
  */
class Sq8SearchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed SQ8 search equals batch q167 over 3 micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val work = Dedup.stageRoot(dir)
    val ckpt =
      java.nio.file.Files.createTempDirectory("sq8-srch-ckpt").toString

    // batch reference; stages the flat index + SQ8 tables
    val batch = Similarity.q167Sq8Rerank(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSet
    val fs = new org.apache.hadoop.fs.Path(s"$work/sq8_results_stream")
    fs.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fs, true)

    // the same flat model the staging trained (deterministic), at the
    // staging's own sizing input
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val (centroids, _) =
      Similarity.trainCodebook(spark, dir, k = Similarity.adaptiveCellCount(n))

    val qRows = Similarity.scaledVectors(spark, dir)
      .where(col("nrm") > 0).where(col("vec_id") < 20)
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Long], Double)].collect().toSeq.sortBy(_._1)
    assert(qRows.size >= 3, s"need >=3 queries, got ${qRows.size}")
    val src = MemoryStream[(Long, Seq[Long], Double)]
    def drain(): Unit =
      EventStreams.sq8SearchStream(
        src.toDF().toDF("vec_id", "v", "nrm"), dir, work, centroids,
        nprobe = 2, ckpt).awaitTermination()
    qRows.grouped((qRows.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain()
    }

    val streamed = spark.read.parquet(s"$work/sq8_results_stream")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(streamed === batch,
      s"streamed ${streamed.size} rows != batch ${batch.size}")

    // drained re-run: no-op
    drain()
    assert(spark.read.parquet(s"$work/sq8_results_stream").count()
      === batch.size.toLong)

    // redelivery through a FRESH checkpoint: no-op by content
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("sq8-srch-ckpt2").toString
    val src2 = MemoryStream[(Long, Seq[Long], Double)]
    src2.addData(qRows: _*)
    EventStreams.sq8SearchStream(
      src2.toDF().toDF("vec_id", "v", "nrm"), dir, work, centroids,
      nprobe = 2, ckpt2).awaitTermination()
    assert(spark.read.parquet(s"$work/sq8_results_stream").count()
      === batch.size.toLong)
  }
}
