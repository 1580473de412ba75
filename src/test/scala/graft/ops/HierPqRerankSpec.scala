package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q136 — the hier + PQ + exact-re-rank COMPOSITION, on the planted
  * metric-gap geometry of IvfPqRerankSpec (ADC's squared-L2 genuinely
  * disagrees with the engine's cosine) extended with a second distant
  * cluster so the two-level quantizer has structure to learn:
  *
  *   - query 5        = block-A direction, magnitude 1
  *   - corpus 40      = SAME direction, magnitude 3 → cosine 1.0 (the
  *     true nearest by the engine's metric) but far in L2² — pure ADC
  *     must not rank it first; the exact re-rank must
  *   - corpus 30..32  = A-direction, one dim dented → ADC's top picks,
  *     cosine < 1
  *   - corpus 20..22  = pure-B cluster (second coarse structure)
  *
  * The spec pins the composition claims, not the pieces (those have
  * their own specs): the end-to-end q136 result equals the exact-cosine
  * order, the staged two-level index actually engaged (k1·k2-cell id
  * space, >1 distinct cell), and every reported neighbor reached the
  * shortlist THROUGH the staged probe list — no path around the index.
  */
class HierPqRerankSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-hierpq").toString
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

  // one run per suite: q136 stages cells_hier/probes_hier/pq_* then
  // searches; the staged tables stay on disk for the membership pins
  private lazy val result: Seq[(Long, Long, Long)] =
    Similarity.q136HierPqRerank(spark, dir)
      .where($"query_id" === 5L)
      .select($"rank", $"neighbor_id", $"query_id")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)

  private lazy val cosineTruth: Seq[Long] = {
    val iv = Similarity.scaledVectors(spark, dir)
    val q = iv.where($"vec_id" === 5L)
      .select($"v".as("qv"), $"nrm".as("qn"))
    q.crossJoin(iv.where($"vec_id" =!= 5L))
      .select($"vec_id",
        (Similarity.idot($"qv", $"v").cast("double") / ($"qn" * $"nrm"))
          .as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .select($"vec_id").as[Long].collect().toSeq
  }

  test("re-rank lifts the cosine-true neighbor to rank 1 through the hier index") {
    assert(result.nonEmpty, "query 5 must return neighbors")
    assert(result.head._2 === 40L,
      s"rank-1 must be the magnitude-3 cosine twin: $result")
  }

  test("re-ranked order is a prefix of the exact-cosine order") {
    // every neighbor the shortlist carried must appear in true-cosine
    // order; candidates outside the probed cells may be absent (that
    // is the index working), but never out of order
    val got = result.map(_._2)
    val want = cosineTruth.filter(got.contains)
    assert(got === want, s"got $got, want (filtered truth) $want")
  }

  test("the staged index engaged: two-level cell ids, >1 distinct cell") {
    val work = Dedup.stageRoot(dir)
    val cells = spark.read.parquet(s"$work/cells_hier")
    assert(cells.select($"cell").distinct().count() > 1)
    // id space is super*k2 + sub — ids at/above k2 prove level-2 use
    assert(cells.agg(max($"cell")).head.getLong(0)
      >= Similarity.HierSubCells)
  }

  test("every reported neighbor came through the staged probe list") {
    val work = Dedup.stageRoot(dir)
    val probed = spark.read.parquet(s"$work/probes_hier")
      .where($"query_id" === 5L)
      .select($"cell").as[Long].collect().toSet
    val cellOf = spark.read.parquet(s"$work/cells_hier")
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    result.foreach { case (rk, nb, _) =>
      assert(probed.contains(cellOf(nb)),
        s"neighbor $nb (rank $rk) sits in cell ${cellOf(nb)}, " +
          s"not in the probed set $probed")
    }
  }

  test("composition plan: equi-joins only, shortlist broadcasts") {
    val p = Similarity.q136HierPqRerank(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }
}
