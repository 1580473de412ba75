package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact re-rank over the ADC shortlist (q130's mechanism): planted
  * geometry where ADC's metric (squared L2, here EXACT since every PQ
  * centroid converges to its own subvector) genuinely disagrees with
  * the engine's similarity (cosine) — the metric gap the re-rank
  * exists to close, isolated from quantization error:
  *
  *   - query 5        = block-A direction, magnitude 1
  *   - corpus 40      = the SAME direction at magnitude 3 → cosine
  *     1.0 (the true nearest by the engine's metric) but L2² = 64·16
  *     scaled units away → ADC ranks it LAST in the cell
  *   - corpus 30..32  = A-direction with one dim dented → tiny L2²
  *     (ADC's top picks) but cosine < 1
  *   - corpus 20..22  = pure-B cluster (gives the coarse quantizer a
  *     second cell; never candidates)
  *
  * Both rankings are deterministic, so the spec pins: pure ADC (q117's
  * path) puts 40 at the bottom of the shortlist; the re-rank lifts it
  * to rank 1; and the re-ranked order equals the exact-cosine order of
  * the whole shortlist.
  */
class IvfPqRerankSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivfpq-rr").toString
    def vec(block: Int, mag: Float, dent: Float) =
      Array.tabulate(64) { i =>
        (if (i / 16 == block) mag else 0.0f) +
          (if (i == block * 16 + 8) dent else 0.0f)
      }
    Seq(
      (5L, vec(0, 1.0f, 0f), 0),
      (40L, vec(0, 3.0f, 0f), 0),
      (30L, vec(0, 1.0f, -0.25f), 0),
      (31L, vec(0, 1.0f, -0.30f), 0),
      (32L, vec(0, 1.0f, -0.35f), 0),
      (20L, vec(3, 1.0f, 0f), 0), (21L, vec(3, 1.0f, 0.02f), 0),
      (22L, vec(3, 1.0f, 0.04f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  /** Exact-cosine ranking of query 5's own-cluster candidates — the
    * order the re-rank must reproduce.
    */
  private lazy val cosineTruth: Seq[Long] = {
    val iv = Similarity.scaledVectors(spark, dir)
    val q = iv.where($"vec_id" === 5L)
      .select($"v".as("qv"), $"nrm".as("qn"))
    q.crossJoin(iv.where($"vec_id".isin(30L, 31L, 32L, 40L)))
      .select($"vec_id",
        (Similarity.idot($"qv", $"v").cast("double") / ($"qn" * $"nrm"))
          .as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .select($"vec_id").as[Long].collect().toSeq
  }

  test("planted geometry: cosine-true nearest is the magnitude-3 twin") {
    assert(cosineTruth.head === 40L, cosineTruth.toString)
  }

  test("pure ADC ranks the cosine-true nearest last; re-rank lifts it to 1") {
    val adc = Similarity.ivfPqSearch(spark, dir, nprobe = 1, k = 2,
      iters = 4, topK = 4)
      .where($"query_id" === 5L).orderBy($"rank")
      .select($"neighbor_id").as[Long].collect().toSeq
    assert(adc.last === 40L, s"ADC should rank 40 (far in L2) last: $adc")
    val rr = Similarity.ivfPqRerankSearch(spark, dir, nprobe = 1, k = 2,
      iters = 4, topK = 4)
      .where($"query_id" === 5L).orderBy($"rank")
      .select($"neighbor_id").as[Long].collect().toSeq
    assert(rr.head === 40L, s"re-rank should lift 40 to rank 1: $rr")
  }

  test("re-ranked order equals the exact-cosine order of the shortlist") {
    val rr = Similarity.ivfPqRerankSearch(spark, dir, nprobe = 1, k = 2,
      iters = 4, topK = 4)
      .where($"query_id" === 5L).orderBy($"rank")
      .select($"neighbor_id").as[Long].collect().toSeq
    assert(rr === cosineTruth, s"got $rr, want $cosineTruth")
  }

  test("re-rank plan: shortlist broadcasts, no cartesian, no corpus shuffle added") {
    val p = Similarity.ivfPqRerankSearch(spark, dir, nprobe = 1, k = 2,
      iters = 4, topK = 4).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }
}
