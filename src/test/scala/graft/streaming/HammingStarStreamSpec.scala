package graft.streaming

import graft.SparkSpec
import graft.functions.AudioFp
import graft.ops.{Dedup, Multimodal, Wav}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed media near-dup staging == the batch star over the same
  * hashes ([[EventStreams.hammingStarStream]] vs
  * [[Multimodal.bandedHammingPairs]] + star contraction): the SAME
  * corpus split into arbitrary micro-batches must fold to row-for-row
  * the same durable star, by the same insert-monotone union-find
  * argument the text and embedding twins ride. Driven through the
  * REAL q176 path — WAV payloads from the planted table, decoded and
  * fingerprinted upstream of the sink exactly as a production caller
  * would — so the stateless-hash-boundary claim is exercised, not
  * assumed. Also pins both idempotence modes.
  */
class HammingStarStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed media star equals the batch star over 3 splits scattering dup groups") {
    implicit val sqlCtx = spark.sqlContext
    val rows: Seq[(Long, Array[Byte])] =
      Multimodal.fpWavTable(spark, sfDir).as[(Long, Array[Byte])]
        .collect().toSeq

    // batch reference: q176's verified pairs, star-contracted
    val batchPairs = Multimodal.q176AudioFpPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val batchStar = Dedup.connectedComponentsStar(batchPairs)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("cluster_id").as("doc_a"), col("doc_id").as("doc_b"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(batchStar.nonEmpty)

    val staged =
      java.nio.file.Files.createTempDirectory("hamming-stream").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("hamming-ckpt").toString
    def hashed(df: org.apache.spark.sql.DataFrame) = {
      import spark.implicits._
      df.as[(Long, Array[Byte])].map { case (id, payload) =>
        val (h0, h1) = AudioFp.fingerprint128(Wav.decode(payload).samples)
        (id, h0, h1)
      }.toDF("doc_id", "h0", "h1")
    }
    val src = MemoryStream[(Long, Array[Byte])]
    def drain(ck: String, st: MemoryStream[(Long, Array[Byte])]): Unit =
      EventStreams.hammingStarStream(
        hashed(st.toDF().toDF("doc_id", "payload")), staged, ck)
        .awaitTermination() // AvailableNow: runs until drained
    // split so each dup group's 4 members scatter across batches
    val shuffled = rows.sortBy { case (id, _) => (id % 3, id) }
    shuffled.grouped((shuffled.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain(ckpt, src)
    }
    def readStar(): Seq[(Long, Long)] =
      spark.read.parquet(s"$staged/media_pairs_star_stream")
        .as[(Long, Long)].collect().toSeq.sorted
    assert(readStar() === batchStar)

    // drained re-run: no-op
    drain(ckpt, src)
    assert(readStar() === batchStar)

    // full redelivery through a FRESH checkpoint: the hash log's
    // content-keyed anti-join must absorb it
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("hamming-ckpt2").toString
    val src2 = MemoryStream[(Long, Array[Byte])]
    src2.addData(rows: _*)
    drain(ckpt2, src2)
    assert(readStar() === batchStar)
    val logCount = spark.read.parquet(s"$staged/hamming_hashes").count()
    assert(logCount === rows.size.toLong,
      s"hash log must hold exactly one row per doc, got $logCount")
  }
}
