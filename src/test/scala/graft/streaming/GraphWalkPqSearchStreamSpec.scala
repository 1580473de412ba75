package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming compressed graph-walk serving == batch q194, on the
  * real embeddings — the {graph} × {compression} cell's serving
  * stream: run the batch entry once (stages the index + graph + PQ
  * families), then stream the SAME 20 query vectors in 3
  * micro-batches through [[EventStreams.graphWalkPqSearchStream]]
  * and assert the accumulated result log equals the batch result
  * row-for-row (shared [[Similarity.graphWalkPqServeOn]] chain —
  * mechanism). Also pins the effectively-once guard under a drained
  * re-run and a fresh-checkpoint full redelivery.
  */
class GraphWalkPqSearchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed compressed walk equals batch q194; replays append nothing") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val work = Dedup.stageRoot(dir)
    val ckpt =
      java.nio.file.Files.createTempDirectory("gwpq-srch-ckpt").toString

    // batch reference; stages the flat index + graph + PQ families
    val batch = Similarity.q194GraphWalkPqRerank(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(batch.nonEmpty)
    val fs = new org.apache.hadoop.fs.Path(
      s"$work/graph_walk_pq_results_stream")
    fs.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fs, true)

    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val (centroids, _) = Similarity.trainCodebook(spark, dir,
      k = Similarity.adaptiveCellCount(n))

    val qRows = Similarity.scaledVectors(spark, dir)
      .where(col("nrm") > 0).where(col("vec_id") < 20)
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Long], Double)].collect().toSeq.sortBy(_._1)
    val src = MemoryStream[(Long, Seq[Long], Double)]
    def drain(ck: String,
        st: MemoryStream[(Long, Seq[Long], Double)]): Unit =
      EventStreams.graphWalkPqSearchStream(
        st.toDF().toDF("vec_id", "v", "nrm"), dir, work, centroids,
        nprobe = 2, ck).awaitTermination()
    qRows.grouped((qRows.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain(ckpt, src)
    }

    def streamed() = spark.read
      .parquet(s"$work/graph_walk_pq_results_stream")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(streamed() === batch)

    // drained re-run: no-op
    drain(ckpt, src)
    assert(streamed() === batch)

    // fresh-checkpoint full redelivery: absorbed per query id
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("gwpq-srch-ckpt2").toString
    val src2 = MemoryStream[(Long, Seq[Long], Double)]
    src2.addData(qRows: _*)
    drain(ckpt2, src2)
    assert(streamed() === batch)
    assert(spark.read.parquet(s"$work/graph_walk_pq_results_stream")
      .count() === batch.size.toLong, "one row per (query, rank), ever")
  }

  test("an off-corpus streamed query reranks against its own vector") {
    // the round-16 advice item: the exact tail used to resolve query
    // vectors from the corpus by id, so a streamed query whose vec_id
    // is absent from the corpus silently produced ZERO rows; since
    // round 17 the caller's (v) threads end-to-end (priced and
    // reranked with the same vector), so an off-corpus id carrying
    // query 0's vector must answer — and at least as well as query 0
    // (same walk, same scores, no self to suppress)
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val work = Dedup.stageRoot(dir)
    val batch = Similarity.q194GraphWalkPqRerank(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val q0 = batch.filter(_._1 == 0L).sortBy(_._2)
    assert(q0.nonEmpty)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val (centroids, _) = Similarity.trainCodebook(spark, dir,
      k = Similarity.adaptiveCellCount(n))
    val offId = 9999999L
    val v0 = Similarity.scaledVectors(spark, dir)
      .where(col("vec_id") === 0L)
      .select(col("v"), col("nrm"))
      .as[(Seq[Long], Double)].head()
    val ckpt =
      java.nio.file.Files.createTempDirectory("gwpq-off-ckpt").toString
    val src = MemoryStream[(Long, Seq[Long], Double)]
    src.addData((offId, v0._1, v0._2))
    EventStreams.graphWalkPqSearchStream(
      src.toDF().toDF("vec_id", "v", "nrm"), dir, work, centroids,
      nprobe = 2, ckpt).awaitTermination()
    val off = spark.read.parquet(s"$work/graph_walk_pq_results_stream")
      .where(col("query_id") === offId)
      .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(_._2)
    assert(off.size === q0.size,
      s"off-corpus query must answer fully, got ${off.size}")
    // reranked with query 0's vector: its best cosine can only match
    // or beat query 0's (vec 0 itself, cosine 1, is now fair game)
    assert(off.head._4 >= q0.head._4 - 1e-9,
      s"${off.head} vs ${q0.head}")
  }
}
