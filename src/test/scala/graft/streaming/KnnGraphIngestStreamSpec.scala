package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed vector log + refresh == the batch k-NN graph derivation
  * ([[EventStreams.knnGraphIngestStream]] /
  * [[EventStreams.refreshKnnGraphFromLog]]): the log is
  * insert-monotone and the graph is a deterministic function of the
  * vector SET, so any batch split folds to the same refreshed graph
  * the batch pipeline derives. Also pins the ingest idempotence pair:
  * a drained re-run appends nothing, and a full redelivery through a
  * FRESH checkpoint is absorbed by content, not offset.
  */
class KnnGraphIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed log + refresh equals the batch graph over 3 arbitrary splits") {
    implicit val sqlCtx = spark.sqlContext
    // two obvious clusters + a boundary-ish vector, ids sparse and out
    // of order; a planted exact-dup pair exercises the pre-collapse in
    // the streamed derivation too
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Array[Long])] = (0 until 60).map { i =>
      val id = i.toLong * 13 + (i % 4) * 500
      val base = if (i % 2 == 0) Array(1000L, 0L, 0L)
        else Array(0L, 1000L, 0L)
      val v = base.map(_ + rnd.nextInt(80).toLong)
      (id, v)
    } :+ (9001L, Array(1040L, 20L, 10L)) :+ (9002L, Array(1040L, 20L, 10L))
    val centroids = Array(Array(1000.0 / 65536, 0.0, 0.0),
      Array(0.0, 1000.0 / 65536, 0.0))

    // batch referee: the same derivation over the same assignment
    val iv = rows.toDF("vec_id", "v")
      .withColumn("nrm",
        sqrt(Similarity.idot(col("v"), col("v")).cast("double")))
      .select(col("vec_id"),
        Similarity.cellAssignment(centroids).as("cluster"),
        col("v"), col("nrm"))
      .localCheckpoint()
    val base = Similarity.knnGraphOf(iv, Similarity.GraphDegree)
      .select(col("query_id"), col("neighbor_id"))
    val bridges =
      Similarity.bridgeEdges(iv, Similarity.cellAdjacency(iv))
    val want = Similarity.knnDescentOf(iv, base.union(bridges),
        Similarity.GraphDegree)
      .as[(Long, Int, Long, Option[Double])].collect().toSeq.sorted

    val staged =
      java.nio.file.Files.createTempDirectory("knn-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("knn-ckpt").toString
    val src = MemoryStream[(Long, Array[Long])]
    def drain(ck: String, st: MemoryStream[(Long, Array[Long])]): Unit =
      EventStreams.knnGraphIngestStream(
        st.toDF().toDF("vec_id", "v"), centroids, staged, ck)
        .awaitTermination()
    def refreshed(): Seq[(Long, Int, Long, Option[Double])] = {
      EventStreams.refreshKnnGraphFromLog(spark, staged)
      spark.read.parquet(
          graft.ops.Staged.path(staged, "knn_graph_stream"))
        .as[(Long, Int, Long, Option[Double])].collect().toSeq.sorted
    }

    val shuffled = rows.sortBy { case (id, _) => (id % 3, -id) }
    val chunks = shuffled.grouped((shuffled.size + 2) / 3).toSeq
    src.addData(chunks(0) ++ chunks(0).take(4): _*) // in-batch dups
    drain(ckpt, src)
    src.addData(chunks(1): _*)
    drain(ckpt, src)
    src.addData(chunks(2) ++ chunks(1).take(5): _*) // cross-batch replay
    drain(ckpt, src)
    assert(refreshed() === want)
    assert(want.nonEmpty)

    // drained re-run: no-op on the log
    drain(ckpt, src)
    val logRows = spark.read.parquet(s"$staged/knn_vectors").count()
    assert(logRows === rows.size.toLong, "log must stay one row per vec")

    // full redelivery through a FRESH checkpoint: absorbed by content
    val ckpt2 = java.nio.file.Files.createTempDirectory("knn-ckpt2").toString
    val src2 = MemoryStream[(Long, Array[Long])]
    src2.addData(rows: _*)
    drain(ckpt2, src2)
    assert(spark.read.parquet(s"$staged/knn_vectors").count()
      === rows.size.toLong)
    assert(refreshed() === want)
  }
}
