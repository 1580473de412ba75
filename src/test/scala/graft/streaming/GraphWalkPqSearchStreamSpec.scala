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
}
