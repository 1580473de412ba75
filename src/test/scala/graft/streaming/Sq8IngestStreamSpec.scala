package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming SQ8 encode == batch SQ8 encode, on the real embeddings
  * table: derive the per-dim (lo, step) params from the corpus split
  * (vec_id % 10 ≠ 9 — the PQ-twin setup where the quantizer's
  * "training" sees only the indexed corpus and the param arrays are
  * then FIXED inputs to ingest), pre-stage the corpus codes, stream
  * the new split in 3 micro-batches through
  * [[EventStreams.sq8IngestStream]], and assert the staged code
  * table equals the batch [[Similarity.sq8Encode]] of the same rows
  * — row-for-row, including vectors whose components fall OUTSIDE
  * the corpus-split [lo, hi] range (the edge-bucket clamp). Plus
  * drained-re-run and fresh-checkpoint redelivery idempotence.
  */
class Sq8IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream-encoded SQ8 codes equal the batch encode over 3 micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val staged =
      java.nio.file.Files.createTempDirectory("sq8-stream").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("sq8-stream-ckpt").toString

    val isNew = col("vec_id") % 10 === 9
    val ivAll = Similarity.scaledVectors(spark, dir)
      .select(col("vec_id"), col("v")).localCheckpoint()
    // params from the corpus split only — the refresh-time aggregate
    val corpus = ivAll.where(!isNew)
    val params = corpus.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("pos")).collect()
    val lo = params.map(_.getAs[Long]("lo"))
    val st = params.map(r => r.getAs[Long]("hi") - r.getAs[Long]("lo"))
    Similarity.sq8Encode(corpus, lo, st)
      .write.mode("overwrite").parquet(s"$staged/sq_codes_stream")
    val corpusCount = corpus.count()

    val newRows = ivAll.where(isNew)
      .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    assert(newRows.size >= 3, s"need >=3 new vectors, got ${newRows.size}")
    // the clamp path must be genuinely exercised: at least one new
    // component outside the corpus-split range
    val outside = newRows.exists { case (_, v) =>
      v.zipWithIndex.exists { case (x, d) => x < lo(d) || x > lo(d) + st(d) }
    }

    val src = MemoryStream[(Long, Seq[Long])]
    def drain(): Unit =
      EventStreams.sq8IngestStream(
        src.toDF().toDF("vec_id", "v"), lo, st, staged, ckpt)
        .awaitTermination()
    newRows.grouped((newRows.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain()
    }

    val streamed = spark.read.parquet(s"$staged/sq_codes_stream")
      .as[(Long, Seq[Long], Long)].collect()
      .map { case (id, c, rsq) => (id, c.toList, rsq) }.toSet
    val batch = Similarity
      .sq8Encode(ivAll.where(isNew), lo, st)
      .unionByName(Similarity.sq8Encode(corpus, lo, st))
      .as[(Long, Seq[Long], Long)].collect()
      .map { case (id, c, rsq) => (id, c.toList, rsq) }.toSet
    assert(streamed === batch)
    assert(streamed.size === corpusCount.toInt + newRows.size)
    // codes stay bytes even for out-of-range components
    assert(streamed.forall(_._2.forall(c => c >= 0L && c <= 255L)))
    if (outside) {
      // an out-of-range component must land in an edge bucket
      val streamedNew = streamed.filter(t => newRows.exists(_._1 == t._1))
      val hasEdge = streamedNew.exists(_._2.exists(c => c == 0L || c == 255L))
      assert(hasEdge, "expected at least one edge-bucket clamp on the new split")
    }

    // exactly-once: drained re-run appends nothing
    drain()
    assert(spark.read.parquet(s"$staged/sq_codes_stream").count()
      === streamed.size.toLong)

    // at-least-once redelivery: same rows, FRESH checkpoint — the
    // anti-join by content must no-op the replay
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("sq8-stream-ckpt2").toString
    val src2 = MemoryStream[(Long, Seq[Long])]
    src2.addData(newRows: _*)
    EventStreams.sq8IngestStream(
      src2.toDF().toDF("vec_id", "v"), lo, st, staged, ckpt2)
      .awaitTermination()
    assert(spark.read.parquet(s"$staged/sq_codes_stream").count()
      === streamed.size.toLong)
  }

  test("in-batch redelivery: a vec_id duplicated WITHIN one micro-batch encodes once") {
    implicit val sqlCtx = spark.sqlContext
    val staged =
      java.nio.file.Files.createTempDirectory("sq8-dupb").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("sq8-dupb-ckpt").toString
    val lo = Array.fill(4)(0L)
    val st = Array.fill(4)(1024L)
    val v: Seq[Long] = Seq(100L, 200L, 300L, 400L)
    val src = MemoryStream[(Long, Seq[Long])]
    src.addData((7L, v), (7L, v), (8L, v))
    EventStreams.sq8IngestStream(
      src.toDF().toDF("vec_id", "v"), lo, st, staged, ckpt)
      .awaitTermination()
    val rows = spark.read.parquet(s"$staged/sq_codes_stream")
      .as[(Long, Seq[Long], Long)].collect()
    assert(rows.length === 2)
    assert(rows.map(_._1).toSet === Set(7L, 8L))
  }
}
