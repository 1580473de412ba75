package graft.ops

import graft.SparkSpec

/** q134 per-doc novelty on a planted corpus:
  *
  *   - doc 1: fully unique text              → novelty 1.0
  *   - docs 2,3: byte-identical twins        → novelty 0.0, 0 unique
  *   - doc 4: two words, no 3-gram shingles  → zero row, NULL novelty
  *   - docs 10..21: a 12-doc family sharing a 5-word boilerplate
  *     phrase (df = 12 > NoveltyDfCap = 10) plus one unique tail
  *     shingle each → exactly (4 shingles, 1 unique, 3 boilerplate,
  *     novelty 0.25) per member
  */
class ShingleNoveltySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-novelty").toString
    val rows =
      Seq((1L, "alpha beta gamma delta"),
        (2L, "epsilon zeta eta theta"),
        (3L, "epsilon zeta eta theta"),
        (4L, "iota kappa")) ++
        (10L to 21L).map(i => (i, s"one two three four five tail$i"))
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val out: Map[Long, (Long, Long, Long, Option[Double])] =
    Dedup.q134ShingleNovelty(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap

  test("unique doc scores novelty 1.0; identical twins score 0.0") {
    assert(out(1L) === ((2L, 2L, 0L, Some(1.0))))
    assert(out(2L) === ((2L, 0L, 0L, Some(0.0))))
    assert(out(3L) === ((2L, 0L, 0L, Some(0.0))))
  }

  test("shingle-less doc keeps its row with NULL novelty") {
    assert(out(4L) === ((0L, 0L, 0L, None)))
  }

  test("boilerplate family: df > cap counted, tail stays novel") {
    for (i <- 10L to 21L)
      assert(out(i) === ((4L, 1L, 3L, Some(0.25))), s"doc $i")
  }

  test("every document reports exactly once") {
    assert(out.size === 16)
  }
}
