package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, Text}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming drift monitor == q150's batch columns, on the real
  * documents table: stage the baselines, stream the WHOLE batch
  * split as one micro-batch, and the appended row set must equal the
  * batch report's (lang, batch_docs, batch_mean_tokens,
  * exact_dup_rate, new_word_rate) exactly — same staged corpus, same
  * arithmetic, so the monitor's alerts mean what the report means.
  * A second run streams the split in 3 chunks (per-batch signals,
  * one row set per batch id) and pins batch-id idempotence: drained
  * re-run and fresh-checkpoint redelivery both append nothing.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val work = Dedup.stageRoot(dir)

  private def stageAll(): Unit = {
    Dedup.stageDedupArchive(spark, dir, work) // corpus_nh
    Text.stageDriftBaseline(spark, dir, work)
  }

  private def clean(): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$work/drift_stream")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
  }

  private def batchRows() = Text.q150CorpusDrift(spark, dir)
    .select("lang", "batch_docs", "corpus_mean_tokens",
      "batch_mean_tokens", "exact_dup_rate", "new_word_rate")
    .as[(String, Long, Option[Double], Option[Double], Option[Double],
      Option[Double])]
    .collect().toSet

  test("one micro-batch carrying the whole split reproduces q150's batch columns") {
    implicit val sqlCtx = spark.sqlContext
    stageAll(); clean()
    val docs = graft.ops.Tables.t(spark, dir, "documents")
      .where($"doc_id" % 10 === 9)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val src = MemoryStream[(Long, String, String)]
    src.addData(docs: _*)
    EventStreams.driftMonitorStream(
      src.toDF().toDF("doc_id", "lang", "text"), work,
      java.nio.file.Files.createTempDirectory("drift-ckpt").toString)
      .awaitTermination()
    // the monitor's columns now include the corpus-side mean-token
    // reference, so a length-drift alert is one row-local comparison
    val streamed = spark.read.parquet(s"$work/drift_stream")
      .select("lang", "batch_docs", "corpus_mean_tokens",
        "batch_mean_tokens", "exact_dup_rate", "new_word_rate")
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])]
      .collect().toSet
    assert(streamed === batchRows())
  }

  test("3-chunk run emits per-batch rows; replays and redeliveries append nothing") {
    implicit val sqlCtx = spark.sqlContext
    stageAll(); clean()
    val docs = graft.ops.Tables.t(spark, dir, "documents")
      .where($"doc_id" % 10 === 9)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val ckpt =
      java.nio.file.Files.createTempDirectory("drift-ckpt3").toString
    val src = MemoryStream[(Long, String, String)]
    def drain(cp: String, s: MemoryStream[(Long, String, String)]): Unit =
      EventStreams.driftMonitorStream(
        s.toDF().toDF("doc_id", "lang", "text"), work, cp)
        .awaitTermination()
    docs.grouped((docs.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain(ckpt, src)
    }
    val log = spark.read.parquet(s"$work/drift_stream")
    val n = log.count()
    assert(log.select("batch_id").distinct().count() === 3L)
    // each batch's doc counts sum to the split size
    assert(log.agg(sum($"batch_docs")).as[Long].head()
      === docs.size.toLong)
    // drained re-run: no-op
    drain(ckpt, src)
    assert(spark.read.parquet(s"$work/drift_stream").count() === n)
    // redelivery of each original batch through a FRESH checkpoint:
    // batch ids restart at 0, but idempotence keys on CONTENT — every
    // redelivered batch matches a logged signature and appends nothing
    docs.grouped((docs.size + 2) / 3).foreach { chunk =>
      val src2 = MemoryStream[(Long, String, String)]
      src2.addData(chunk: _*)
      drain(java.nio.file.Files
        .createTempDirectory("drift-ckpt4").toString, src2)
    }
    assert(spark.read.parquet(s"$work/drift_stream").count() === n)
    // genuinely NEW content whose batch id collides with a logged one
    // (fresh checkpoint -> id 0) must still land — the round-10
    // advisor's finding: id-keying silently masked new feed data
    val id0Before = spark.read.parquet(s"$work/drift_stream")
      .where($"batch_id" === 0L).count()
    val extra = graft.ops.Tables.t(spark, dir, "documents")
      .where($"doc_id" % 10 === 1)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1).take(20)
    val src3 = MemoryStream[(Long, String, String)]
    src3.addData(extra: _*)
    drain(java.nio.file.Files
      .createTempDirectory("drift-ckpt5").toString, src3)
    val after = spark.read.parquet(s"$work/drift_stream")
    assert(after.count() > n, "a new batch with a colliding id was dropped")
    assert(after.where($"batch_id" === 0L).count() > id0Before,
      "the new rows should carry the colliding batch id 0")
  }
}
