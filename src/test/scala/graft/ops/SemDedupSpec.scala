package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q92 semantic dedup on a planted corpus: two tight near-dup groups
  * (pairwise cosine ≈ 1 ≫ threshold) on orthogonal block patterns,
  * plus two isolated orthogonal vectors. Orthogonal patterns have
  * cosine ≈ 0 < threshold, so even if the coarse quantizer co-cells
  * them no false edge can form; the tight groups must come back as
  * complete clusters with the minimum id elected survivor, and the
  * isolated vectors must not appear at all.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    def vec(block: Int, jitter: Int): Seq[Float] =
      Array.tabulate(64) { dim =>
        (if (dim / 16 == block) 10.0f else 0.0f) +
          0.001f * ((jitter + dim) % 3)
      }.toSeq
    val rows = Seq(
      (0L, vec(0, 0), 0), (1L, vec(0, 1), 0), (2L, vec(0, 2), 0),
      (10L, vec(1, 0), 1), (11L, vec(1, 1), 1),
      (20L, vec(2, 0), 2), (21L, vec(3, 0), 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("q92: tight groups cluster completely, min id survives, isolates absent") {
    val out = Similarity.q92SemanticDedup(spark, dir)
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out === Seq(
      (0L, 0L, true), (1L, 0L, false), (2L, 0L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }

  test("q92: staged semantic edges are the per-group min-id STARS, not all pairs") {
    Similarity.q92SemanticDedup(spark, dir).collect() // force staging
    val pairs = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/sem_pairs")
      .as[(Long, Long)].collect().toSet
    // group {0,1,2} stages 2 star edges (not the 3 raw pairs), group
    // {10,11} stages its single edge — linear in group size
    assert(pairs === Set((0L, 1L), (0L, 2L), (10L, 11L)))
  }
}
