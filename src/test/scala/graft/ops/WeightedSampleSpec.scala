package graft.ops

import graft.SparkSpec

/** q132 deterministic weighted bottom-k sampling.
  *
  * The contract is a KEYED sample: selection is a pure function of
  * (doc_id, weight), so an independent JVM-side replay (MessageDigest
  * md5 → 60-bit key → integer division → bottom-5) must reproduce the
  * engine's picks EXACTLY — not statistically. A planted heavy doc
  * (weight 2^60 ≫ any 60-bit key) must always win its source, and a
  * small source keeps all its docs.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def h60(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ws:$docId".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def mkDir(rows: Seq[(Long, String, Long)]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-wsample").toString
    rows.map { case (id, src, w) => (id, s"text $id", "en", src, w) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("engine sample equals the independent JVM replay, per source") {
    val rows = (0L until 40L).map(i => (i, s"src${i % 3}", (i % 7) * 100 + 1))
    val dir = mkDir(rows)
    val got = Text.q132WeightedSample(spark, dir)
      .select($"source", $"rank", $"doc_id", $"priority")
      .as[(String, Int, Long, Long)].collect().toSeq
    val want = rows.groupBy(_._2).toSeq.flatMap { case (src, docs) =>
      docs.map { case (id, _, w) => (id, h60(id) / math.max(w, 1L)) }
        .sortBy { case (id, pri) => (pri, id) }
        .take(5).zipWithIndex
        .map { case ((id, pri), i) => (src, i + 1, id, pri) }
    }.sortBy(r => (r._1, r._2))
    assert(got === want)
  }

  test("a heavy document always wins its source") {
    // weight 2^60 exceeds any 60-bit key: priority 0, unbeatable
    val dir = mkDir(Seq((1L, "s", 1L), (2L, "s", 1L), (3L, "s", 1L),
      (4L, "s", 1L), (5L, "s", 1L), (6L, "s", 1L),
      (99L, "s", 1L << 60)))
    val top = Text.q132WeightedSample(spark, dir)
      .where($"rank" === 1).select($"doc_id").as[Long].head()
    assert(top === 99L)
  }

  test("a source smaller than k keeps every doc; zero weight clamps") {
    val dir = mkDir(Seq((1L, "tiny", 0L), (2L, "tiny", 5L)))
    val out = Text.q132WeightedSample(spark, dir)
      .select($"doc_id", $"weight").as[(Long, Long)].collect().toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === 1L) // clamped, not divide-by-zero
  }
}
