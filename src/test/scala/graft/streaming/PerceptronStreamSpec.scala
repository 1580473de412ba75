package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, Text}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming gate scoring == batch q160, on the real documents: run
  * the batch entry once (trains and STAGES the weights), then stream
  * the same documents in 3 micro-batches through
  * [[EventStreams.perceptronScoreStream]] and assert the accumulated
  * score log equals the batch predictions row-for-row — the stream
  * never trains, it serves the staged model, which is the production
  * split (train per refresh, score per batch). Also pins the
  * effectively-once guard under a drained re-run and a fresh-
  * checkpoint redelivery.
  */
class PerceptronStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed gate scores equal batch q160 over 3 micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val work = Dedup.stageRoot(dir)
    val ckpt =
      java.nio.file.Files.createTempDirectory("gate-stream-ckpt").toString

    val batch = Text.q160BatchPerceptron(spark, dir)
      .as[(Long, Int, Long, Int, Boolean)].collect().toSet
    val fs = new org.apache.hadoop.fs.Path(s"$work/gate_scores_stream")
    fs.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fs, true)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val src = MemoryStream[(Long, String)]
    def drain(cp: String, s: MemoryStream[(Long, String)]): Unit =
      EventStreams.perceptronScoreStream(
        s.toDF().toDF("doc_id", "text"), work, cp).awaitTermination()
    docs.grouped((docs.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain(ckpt, src)
    }

    val streamed = spark.read.parquet(s"$work/gate_scores_stream")
      .as[(Long, Int, Long, Int, Boolean)].collect().toSet
    assert(streamed === batch,
      s"streamed ${streamed.size} rows != batch ${batch.size}")

    // drained re-run: no-op
    drain(ckpt, src)
    assert(spark.read.parquet(s"$work/gate_scores_stream").count()
      === batch.size.toLong)

    // full redelivery through a FRESH checkpoint: no-op by content
    val src2 = MemoryStream[(Long, String)]
    src2.addData(docs: _*)
    drain(java.nio.file.Files.createTempDirectory("gate-stream-ckpt2")
      .toString, src2)
    assert(spark.read.parquet(s"$work/gate_scores_stream").count()
      === batch.size.toLong)
  }
}
