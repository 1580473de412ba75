package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q82 (in-cell near-dup pairs) vs q34 (exact all-pairs) on a corpus
  * planted to exercise both sides of the IVF blocking trade-off:
  *
  *   - four orthogonal clusters on axis blocks 0/1/2/3 (dims 0–7,
  *     8–15, 16–23, 24–31), ids 10c, 10c+1, 10c+2: the (10c, 10c+1)
  *     pair is a true near-dup (cos ≈ 0.999998), 10c+2 is same-cluster
  *     but distinct (cos ≈ 0.994);
  *   - a BOUNDARY near-dup pair (40, 41): both are A/B mixes with
  *     cos(40,41) ≈ 0.997, but 40 leans A (0.75/0.66) and 41 leans B
  *     (0.70/0.72), so k-means quantizes them into DIFFERENT cells.
  *
  * The spec pins exactly what the q82 scaladoc claims: every
  * same-cell near-dup is recovered with its exact cosine, ranked
  * ahead of everything else; the cross-cell pair is the one loss
  * (found by exact q34, missed by the blocked join); and the physical
  * plan is a hash equi-join on the cell id, never a cartesian.
  */
class NeardupIvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    def vec(block: Int, jitter: Float) =
      Array.tabulate(64)(i =>
        (if (i / 8 == block) 1.0f else 0.0f) +
          (if (i == 63) jitter else 0.0f))
    def mix(wa: Float, wb: Float) =
      Array.tabulate(64)(i =>
        if (i / 8 == 0) wa else if (i / 8 == 1) wb else 0.0f)
    val rows =
      (0 to 3).flatMap { c =>
        Seq((10L * c, vec(c, 0.0f), c), (10L * c + 1, vec(c, 0.002f), c),
          (10L * c + 2, vec(c, 0.3f), c))
      } ++ Seq((40L, mix(0.75f, 0.66f), 0), (41L, mix(0.70f, 0.72f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSeq

  private lazy val exact = pairs(Similarity.q34EmbeddingTopPairs(spark, dir))
  private lazy val blocked = Similarity.q82NeardupIvf(spark, dir)
  private lazy val blockedPairs = pairs(blocked)

  test("every same-cell planted near-dup pair is recovered, ranked first") {
    val planted = (0 to 3).map(c => (10L * c, 10L * c + 1)).toSet
    assert(blockedPairs.take(4).toSet === planted,
      s"top-4 should be the planted near-dups: ${blockedPairs.take(4)}")
  }

  test("the cross-cell boundary pair is q34's find and q82's documented miss") {
    assert(exact.contains((40L, 41L)), s"exact top-20 should see (40,41): $exact")
    assert(!blockedPairs.contains((40L, 41L)),
      s"in-cell join must not see the cross-cell pair: $blockedPairs")
  }

  test("in-cell cosines are the exact cosines (blocking prunes, never approximates)") {
    val exactCos = Similarity.q34EmbeddingTopPairs(spark, dir)
      .select($"vec_a", $"vec_b", $"cosine").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val got = blocked.select($"vec_a", $"vec_b", $"cosine")
      .as[(Long, Long, Double)].collect()
    got.foreach { case (a, b, c) =>
      exactCos.get((a, b)).foreach(e => assert(c === e, s"($a,$b)"))
    }
    assert(got.nonEmpty)
  }

  test("plan is a hash equi-join on the cell id — no cartesian, no BNLJ") {
    val p = blocked.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
