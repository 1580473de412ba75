package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming shard ingest == the trained model's own batch assignment,
  * on the real embeddings table: train the sharded index once
  * ([[Similarity.trainShardedCells]]), stage the 90 % split's
  * assignments as the pre-existing index, stream the new split
  * (vec_id % 10 = 9) in 3 micro-batches through
  * [[EventStreams.shardIngestStream]], and assert the resulting
  * staged table equals the model's full batch assignment row-for-row.
  * Both paths run the SAME pmod-shard + broadcast-table argmax
  * ([[Similarity.assignShardCells]]), so any divergence is streaming
  * plumbing. Also asserts the drained-re-run and
  * fresh-checkpoint-redelivery idempotence modes.
  */
class ShardIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream-ingested shard cells equal the model's batch assignment over 3 micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val staged =
      java.nio.file.Files.createTempDirectory("shard-stream").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("shard-stream-ckpt").toString

    val isNew = col("vec_id") % 10 === 9
    val iv = Similarity.scaledVectors(spark, dir)
      .where(col("nrm") > 0)
      .select(col("vec_id"), col("v"), col("nrm"))
      .localCheckpoint()
    val shards = Similarity.NumShards
    val n = Similarity.scaledVectors(spark, dir).count()
    val kS = Similarity.adaptiveCellCount((n + shards - 1) / shards)
    val (cents, asg) = Similarity.trainShardedCells(spark, dir, shards)
    val full = asg.localCheckpoint() // the model's own full assignment
    full.join(iv.where(!isNew).select(col("vec_id")), "vec_id")
      .write.mode("overwrite").parquet(s"$staged/cells_shard_stream")

    val newRows = iv.where(isNew)
      .as[(Long, Seq[Long], Double)].collect().toSeq.sortBy(_._1)
    assert(newRows.size >= 3, s"need >=3 new vectors, got ${newRows.size}")
    val src = MemoryStream[(Long, Seq[Long], Double)]
    def drain(): Unit =
      EventStreams.shardIngestStream(
        src.toDF().toDF("vec_id", "v", "nrm"), cents, shards, kS,
        staged, ckpt)
        .awaitTermination() // AvailableNow: runs until drained
    newRows.grouped((newRows.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain()
    }

    val streamed = spark.read.parquet(s"$staged/cells_shard_stream")
      .as[(Long, Long)].collect().toSet
    val batch = full.as[(Long, Long)].collect().toSet
    assert(streamed === batch,
      s"streamed ${streamed.size} rows != batch ${batch.size}")

    // drained re-run with the same checkpoint: no-op
    drain()
    assert(spark.read.parquet(s"$staged/cells_shard_stream").count()
      === batch.size.toLong)

    // redelivery through a FRESH checkpoint: still a no-op by content
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("shard-stream-ckpt2").toString
    val src2 = MemoryStream[(Long, Seq[Long], Double)]
    src2.addData(newRows: _*)
    EventStreams.shardIngestStream(
      src2.toDF().toDF("vec_id", "v", "nrm"), cents, shards, kS,
      staged, ckpt2)
      .awaitTermination()
    assert(spark.read.parquet(s"$staged/cells_shard_stream").count()
      === batch.size.toLong)
  }
}
