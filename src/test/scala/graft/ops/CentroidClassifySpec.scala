package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** q131 nearest-centroid (Rocchio) classification on a planted corpus.
  *
  * Geometry: label 0's train vectors (ids 1,2,3 — vec_id % 5 ≠ 0) sit
  * on axis block A (dims 0–7), label 1's (ids 6,7,8) on axis block B
  * (dims 24–31), with IDENTICAL jitter patterns on dim 63 so the two
  * trained centroids are exact mirror images (same norm, symmetric
  * components). The held-out set (vec_id % 5 = 0) then probes four
  * deterministic behaviors:
  *
  *   - id  5 = pure A        → predicted label 0
  *   - id 10 = pure B        → predicted label 1
  *   - id 15 = A + B equally → EXACT score tie → lower label (0) wins
  *   - id  0 = all-zero      → cosine NULL for every centroid → the
  *     coalesce(-2.0) ordering still elects deterministically (label 0)
  *     and the reported score stays NULL, not a fabricated number
  */
class CentroidClassifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-rocchio").toString
    def bvec(wa: Float, wb: Float, jitter: Float) =
      Array.tabulate(64) { i =>
        (if (i / 8 == 0) wa else if (i / 8 == 3) wb else 0.0f) +
          (if (i == 63) jitter else 0.0f)
      }
    Seq(
      // train, label 0 (block A)
      (1L, bvec(1.0f, 0f, 0.00f), 0), (2L, bvec(1.0f, 0f, 0.02f), 0),
      (3L, bvec(1.0f, 0f, 0.04f), 0),
      // train, label 1 (block B) — same jitters: mirror centroid
      (6L, bvec(0f, 1.0f, 0.00f), 1), (7L, bvec(0f, 1.0f, 0.02f), 1),
      (8L, bvec(0f, 1.0f, 0.04f), 1),
      // held-out probes
      (5L, bvec(1.0f, 0f, 0f), 9), (10L, bvec(0f, 1.0f, 0f), 9),
      (15L, bvec(1.0f, 1.0f, 0f), 9),
      (0L, Array.fill(64)(0.0f), 9))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val out: Map[Long, Row] =
    Similarity.q131CentroidClassify(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap

  test("axis-aligned probes classify to their own centroid") {
    assert(out(5L).getInt(2) === 0)
    assert(out(10L).getInt(2) === 1)
    assert(out(5L).getDouble(3) > 0.99)
    assert(out(10L).getDouble(3) > 0.99)
  }

  test("exact score tie elects the lower label") {
    // mirror symmetry ⟹ dot(v15, c0) == dot(v15, c1) in exact ints,
    // so only the (score desc, label asc) tie-break decides
    assert(out(15L).getInt(2) === 0)
    assert(out(15L).getDouble(3) > 0.5)
  }

  test("zero-norm probe reports NULL score, deterministic label") {
    assert(out(0L).getInt(2) === 0)
    assert(out(0L).isNullAt(3))
  }

  test("every held-out vector gets exactly one prediction row") {
    assert(out.keySet === Set(0L, 5L, 10L, 15L))
  }
}
