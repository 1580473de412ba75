package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-probe IVF recall: the known 1-probe cliff is a query sitting
  * near a cell boundary whose true nearest neighbor was quantized into
  * the NEIGHBORING cell. This corpus plants exactly that geometry:
  *
  *   - pure-A cluster (ids 0..2, axis dims 0–7)
  *   - pure-B cluster (ids 20..22, axis dims 24–31)
  *   - corpus vector 30 = 0.75·A + 0.66·B  → quantizes into the A cell
  *   - query  vector  5 = 0.70·A + 0.72·B  → quantizes into the B cell
  *
  * cos(5, 30) ≈ 0.997 — vector 30 is query 5's true nearest by a wide
  * margin — yet 1-probe search never scans the A cell and must miss it.
  * 2-probe scans the query's two nearest cells and recovers it.
  */
class IvfMultiProbeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-multiprobe").toString
    def bvec(wa: Float, wb: Float, jitter: Float) =
      Array.tabulate(64) { i =>
        (if (i / 8 == 0) wa else if (i / 8 == 3) wb else 0.0f) +
          (if (i == 63) jitter else 0.0f)
      }
    Seq(
      (0L, bvec(1.0f, 0f, 0.00f), 0), (1L, bvec(1.0f, 0f, 0.02f), 0),
      (2L, bvec(1.0f, 0f, 0.04f), 0),
      (20L, bvec(0f, 1.0f, 0.00f), 0), (21L, bvec(0f, 1.0f, 0.02f), 0),
      (22L, bvec(0f, 1.0f, 0.04f), 0),
      (30L, bvec(0.75f, 0.66f, 0f), 0),
      (5L, bvec(0.70f, 0.72f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  /** Brute-force ground-truth top-3 for query 5 (no cells at all). */
  private lazy val truth: Seq[Long] = {
    val iv = Similarity.scaledVectors(spark, dir)
    val q = iv.where($"vec_id" === 5L)
      .select($"v".as("qv"), $"nrm".as("qn"))
    q.crossJoin(iv.where($"vec_id" =!= 5L))
      .select($"vec_id",
        (Similarity.idot($"qv", $"v").cast("double") / ($"qn" * $"nrm"))
          .as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(3).select($"vec_id").as[Long].collect().toSeq
  }

  private def top3(nprobe: Int): Seq[Long] =
    Similarity.ivfSearch(spark, dir, nprobe, k = 2, iters = 4, topK = 3)
      .where($"query_id" === 5L)
      .orderBy($"rank")
      .select($"neighbor_id").as[Long].collect().toSeq

  test("boundary query: true nearest lives in the neighboring cell") {
    assert(truth.head === 30L, truth.toString)
  }

  test("1-probe misses the cross-cell nearest; 2-probe recovers it at rank 1") {
    val one = top3(1)
    val two = top3(2)
    assert(!one.contains(30L), s"1-probe unexpectedly found 30: $one")
    assert(two.head === 30L, s"2-probe should rank 30 first: $two")
  }

  test("recall@3 strictly improves from 1-probe to 2-probe") {
    val r1 = top3(1).toSet.intersect(truth.toSet).size
    val r2 = top3(2).toSet.intersect(truth.toSet).size
    assert(r2 > r1, s"recall: 1-probe $r1/3, 2-probe $r2/3")
    assert(r2 === 3, s"2-probe should reach full recall here: $r2/3")
  }

  test("multi-probe search plan stays an equi-join — no cartesian blowup") {
    val p = Similarity.ivfSearch(spark, dir, nprobe = 2, k = 2, iters = 4,
      topK = 3).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("cluster"), p.take(800))
  }
}
