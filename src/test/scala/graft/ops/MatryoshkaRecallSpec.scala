package graft.ops

import graft.SparkSpec

/** q133 prefix-dimension recall: plants the geometry where truncation
  * genuinely loses information, so the curve is forced, not incidental.
  *
  *   - query 0  = e0 + e40 (signal in the prefix AND the tail)
  *   - id 20    = e0 only            — prefix-identical to the query
  *   - id 21    = e0 + 2·e40        — the TRUE full-dim nearest
  *   - id 22    = e1 only            — orthogonal noise
  *
  * Any prefix d ≤ 40 sees ids 20 and 21 as EXACT ties (cos = 1.0), and
  * the deterministic (cos desc, neighbor_id asc) tie-break elects 20 —
  * the wrong answer — so recall@1 must be 0.0 for d ∈ {8, 16, 32}. The
  * full 64-dim row is scored against itself: exactly (1.0, 1.0).
  */
class MatryoshkaRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-mrl").toString
    def v(pairs: (Int, Float)*) = {
      val a = Array.fill(64)(0.0f)
      pairs.foreach { case (i, x) => a(i) = x }
      a
    }
    Seq(
      (0L, v(0 -> 1.0f, 40 -> 1.0f), 0),
      (20L, v(0 -> 1.0f), 0),
      (21L, v(0 -> 1.0f, 40 -> 2.0f), 0),
      (22L, v(1 -> 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val rows: Map[Int, (Long, Double, Double)] =
    Similarity.q133MatryoshkaRecall(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap

  test("full-dim row scores itself: recall (1.0, 1.0)") {
    assert(rows(64) === ((1L, 1.0, 1.0)))
  }

  test("prefixes blind to the tail miss the true nearest neighbor") {
    for (d <- Seq(8, 16, 32)) {
      val (nq, r1, _) = rows(d)
      assert(nq === 1L)
      assert(r1 === 0.0, s"dims=$d should tie-break to the wrong id")
    }
  }

  test("all four prefix widths report") {
    assert(rows.keySet === Set(8, 16, 32, 64))
  }
}
