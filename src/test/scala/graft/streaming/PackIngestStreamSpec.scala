package graft.streaming

import graft.SparkSpec
import graft.ops.Text
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed packing-family ingest == the batch q177 index
  * ([[EventStreams.packIngestStream]] folds per-doc token counts into
  * a durable log; [[Text.packIndexOfCounts]] over that log must equal
  * the batch entry row-for-row, because the counts are insert-monotone
  * and the index is a deterministic function of the count SET — doc
  * order is keyed by doc_id, not arrival). Also pins the two ingest
  * idempotence properties: a drained re-run appends nothing, and a
  * full redelivery through a FRESH checkpoint (crash between write and
  * commit) is absorbed by content, not offset.
  */
class PackIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed pack counts derive the batch q177 index over 3 arbitrary batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("pack-corpus").toString
    // doc ids deliberately SPARSE and out of arrival order (the block
    // partition must be id-distribution-agnostic), word counts varied
    // so bins split mid-doc
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, String)] = (0 until 120).map { i =>
      val id = i.toLong * 37 + (i % 5) * 1000
      val n = 3 + rnd.nextInt(40)
      (id, (0 until n).map(w => s"d${id}w$w").mkString(" "))
    }
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val batch = Text.q177TokenStreamPack(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(batch.nonEmpty)

    val staged =
      java.nio.file.Files.createTempDirectory("pack-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pack-ckpt").toString
    val src = MemoryStream[(Long, String)]
    def drain(ck: String, st: MemoryStream[(Long, String)]): Unit =
      EventStreams.packIngestStream(
        st.toDF().toDF("doc_id", "text"), staged, ck)
        .awaitTermination()
    def derived(): Seq[(Long, Long, Long, Long, Long)] =
      Text.packIndexOfCounts(
        EventStreams.resolvedPackCounts(spark, staged))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted

    // 3-way split that scatters id order across batches, with an
    // in-batch replay (doc repeated inside one batch)
    val shuffled = rows.sortBy { case (id, _) => (id % 3, -id) }
    val chunks = shuffled.grouped((shuffled.size + 2) / 3).toSeq
    src.addData(chunks(0) ++ chunks(0).take(3): _*) // in-batch dups
    drain(ckpt, src)
    src.addData(chunks(1): _*)
    drain(ckpt, src)
    // cross-batch replay: some of chunk 1 redelivered with chunk 2
    src.addData(chunks(2) ++ chunks(1).take(5): _*)
    drain(ckpt, src)
    assert(derived() === batch)

    // drained re-run: no-op
    drain(ckpt, src)
    assert(derived() === batch)

    // full redelivery through a FRESH checkpoint: absorbed by content
    val ckpt2 = java.nio.file.Files.createTempDirectory("pack-ckpt2").toString
    val src2 = MemoryStream[(Long, String)]
    src2.addData(rows: _*)
    drain(ckpt2, src2)
    assert(derived() === batch)
    val logRows = spark.read.parquet(s"$staged/pack_counts").count()
    assert(logRows === rows.size.toLong, "log must stay one row per doc")
  }
}
