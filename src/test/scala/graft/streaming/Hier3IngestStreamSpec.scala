package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming THREE-level ingest == the trained model's own batch
  * assignment, on the real embeddings table — [[HierIngestStreamSpec]]
  * one level deeper, at the forced [[Similarity.hier3Sizing]] geometry
  * (the depth the production router auto-selects above 4096 cells).
  * Train once, stage the 90 % split as the pre-existing index, stream
  * the new split in 3 micro-batches through
  * [[EventStreams.hier3IngestStream]], assert row-for-row equality,
  * then both idempotence modes (drained re-run; fresh-checkpoint
  * redelivery — the anti-join-by-content carries it, not the offset
  * log).
  */
class Hier3IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream-ingested hier3 cells equal the model's batch assignment over 3 micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val staged =
      java.nio.file.Files.createTempDirectory("hier3-stream").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("hier3-stream-ckpt").toString

    val isNew = col("vec_id") % 10 === 9
    val iv = Similarity.scaledVectors(spark, dir)
      .where(col("nrm") > 0)
      .select(col("vec_id"), col("v"), col("nrm"))
      .localCheckpoint()
    val (k1, k2, k3) = Similarity.hier3Sizing(iv.count())
    val (c1, cents2, cents3, asg) =
      Similarity.trainHier3(spark, dir, k1, k2, k3)
    val full = asg.localCheckpoint() // the model's own full assignment
    full.join(iv.where(!isNew).select(col("vec_id")), "vec_id")
      .write.mode("overwrite").parquet(s"$staged/cells_hier3_stream")

    val newRows = iv.where(isNew)
      .as[(Long, Seq[Long], Double)].collect().toSeq.sortBy(_._1)
    assert(newRows.size >= 3, s"need >=3 new vectors, got ${newRows.size}")
    val src = MemoryStream[(Long, Seq[Long], Double)]
    def drain(): Unit =
      EventStreams.hier3IngestStream(
        src.toDF().toDF("vec_id", "v", "nrm"), c1, cents2, cents3, k2, k3,
        staged, ckpt)
        .awaitTermination() // AvailableNow: runs until drained
    newRows.grouped((newRows.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain()
    }

    val streamed = spark.read.parquet(s"$staged/cells_hier3_stream")
      .as[(Long, Long)].collect().toSet
    val batch = full.as[(Long, Long)].collect().toSet
    assert(streamed === batch,
      s"streamed ${streamed.size} rows != batch ${batch.size}")

    // drained re-run with the same checkpoint: no-op
    drain()
    assert(spark.read.parquet(s"$staged/cells_hier3_stream").count()
      === batch.size.toLong)

    // redelivery through a FRESH checkpoint: still a no-op by content
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("hier3-stream-ckpt2").toString
    val src2 = MemoryStream[(Long, Seq[Long], Double)]
    src2.addData(newRows: _*)
    EventStreams.hier3IngestStream(
      src2.toDF().toDF("vec_id", "v", "nrm"), c1, cents2, cents3, k2, k3,
      staged, ckpt2)
      .awaitTermination()
    assert(spark.read.parquet(s"$staged/cells_hier3_stream").count()
      === batch.size.toLong)
  }
}
