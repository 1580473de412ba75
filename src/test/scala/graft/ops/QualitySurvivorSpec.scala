package graft.ops

import graft.SparkSpec

/** q127 quality-aware survivor election: the elected survivor must be
  * the cluster's max-quality member (q51's score, ties to lowest id),
  * which on the planted corpus DIFFERS from the min-id member q36/q37
  * elect — the point of the query. Singletons elect themselves,
  * including the NULL-quality (empty-text) corner.
  */
class QualitySurvivorSpec extends SparkSpec {
  import spark.implicits._

  test("survivor is the max-quality member, not the min-id member") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q127").toString
    // docs 1 and 2 are near-dups (J of 3-shingles ≈ 0.94 ≥ 0.8): doc 2
    // swaps the last word for the stopword "the", which raises BOTH
    // its stop-ratio and its alpha-ratio — strictly higher q51 quality
    // than doc 1 — so the quality election must keep 2 where min-id
    // keeps 1. Docs 8 (normal) and 9 (empty text → NULL quality) are
    // unrelated singletons.
    val base = (1 to 100).map(i => s"w$i")
    val lowQ = base.mkString(" ")
    val highQ = (base.dropRight(1) :+ "the").mkString(" ")
    Seq(
      (1L, lowQ, "en", "src0"),
      (2L, highQ, "en", "src0"),
      (8L, (1 to 50).map(i => s"u$i").mkString(" "), "en", "src0"),
      (9L, "", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Dedup.q127QualitySurvivors(spark, dir)
      .as[(Long, Long, Option[Double], Long)].collect().toSeq
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // the {1,2} cluster is labeled by its min id but survived by 2
    assert(got.keySet === Set(1L, 8L, 9L))
    val (survivor, q, n) = got(1L)
    assert(survivor === 2L, got.toString)
    assert(n === 2L)
    assert(q.exists(_ > 0.0))
    // min-id election (q36's law) would have kept doc 1 instead
    val minId = Dedup.q36DedupSurvivors(spark, dir)
      .as[Long].collect().toSet
    assert(minId.contains(1L) && !minId.contains(2L))
    // singletons elect themselves; empty doc carries NULL quality
    assert(got(8L)._1 === 8L && got(8L)._3 === 1L)
    assert(got(9L)._1 === 9L && got(9L)._2.isEmpty && got(9L)._3 === 1L)
  }
}
