package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-probe composed into IVF-PQ (q117): IvfMultiProbeSpec's planted
  * boundary geometry, priced by ADC over PQ codes instead of exact
  * cosine — the compressed index is audited exactly where compression
  * is most tempted to hide a recall loss, the cell boundary.
  *
  *   - pure-A cluster (ids 0..2), pure-B cluster (ids 20..22)
  *   - corpus vector 30 = 0.75·A + 0.66·B → quantizes into the A cell
  *   - query  vector  5 = 0.70·A + 0.72·B → quantizes into the B cell
  *
  * Vector 30 is query 5's true nearest by squared L2 (the ADC metric)
  * as well as by cosine: 1-probe IVF-PQ never prices the A cell and
  * must miss it; 2-probe prices both cells and recovers it at rank 1.
  * On this tiny corpus each PQ centroid converges to its own
  * subvector, so ADC distances are exact and the miss is PURELY the
  * candidate cut — the composition (probe rows widening the candidate
  * join) is the only thing under test.
  */
class IvfPqMultiprobeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivfpq-mp").toString
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

  /** Ground-truth top-3 for query 5 by exact squared L2 — the metric
    * ADC approximates (here: equals, see class doc).
    */
  private lazy val truth: Seq[Long] = {
    val iv = Similarity.scaledVectors(spark, dir)
    val q = iv.where($"vec_id" === 5L).select($"v".as("qv"))
    q.crossJoin(iv.where($"vec_id" =!= 5L))
      .select($"vec_id",
        (Similarity.idot($"qv", $"qv") + Similarity.idot($"v", $"v")
          - lit(2L) * Similarity.idot($"qv", $"v")).as("d2"))
      .orderBy($"d2", $"vec_id")
      .limit(3).select($"vec_id").as[Long].collect().toSeq
  }

  private def top3(nprobe: Int): Seq[Long] =
    Similarity.ivfPqSearch(spark, dir, nprobe, k = 2, iters = 4, topK = 3)
      .where($"query_id" === 5L)
      .orderBy($"rank")
      .select($"neighbor_id").as[Long].collect().toSeq

  test("boundary query: true nearest (by the ADC metric) is cross-cell") {
    assert(truth.head === 30L, truth.toString)
  }

  test("1-probe IVF-PQ misses the cross-cell nearest; 2-probe recovers it") {
    val one = top3(1)
    val two = top3(2)
    assert(!one.contains(30L), s"1-probe unexpectedly found 30: $one")
    assert(two.head === 30L, s"2-probe should rank 30 first: $two")
  }

  test("recall@3 strictly improves from 1-probe to 2-probe IVF-PQ") {
    val r1 = top3(1).toSet.intersect(truth.toSet).size
    val r2 = top3(2).toSet.intersect(truth.toSet).size
    assert(r2 > r1, s"recall: 1-probe $r1/3, 2-probe $r2/3")
    assert(r2 === 3, s"2-probe should reach full recall here: $r2/3")
  }

  test("multi-probe IVF-PQ plan stays equi-joins — no cartesian blowup") {
    val p = Similarity.ivfPqSearch(spark, dir, nprobe = 2, k = 2, iters = 4,
      topK = 3).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }
}
