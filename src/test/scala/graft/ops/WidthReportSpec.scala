package graft.ops

import graft.SparkSpec

/** q137 — the shortlist-width tuning report's structural guarantees on
  * the real sf0.001 embeddings: all three widths report, recall is a
  * probability, and recall@5 is MONOTONE in the width (the docstring's
  * argument: a wider shortlist's exact top-5 can only gain truth
  * members — any candidate that displaces a truth member outranks it
  * by exact cosine and is therefore itself a truth member).
  */
class WidthReportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows: Seq[(Int, Long, Double, Double)] =
    Similarity.q137RerankWidthReport(spark, "/root/testdata/sf0.001")
      .as[(Int, Long, Double, Double)].collect().toSeq.sortBy(_._1)

  test("all configured widths report, in order") {
    assert(rows.map(_._1) === Similarity.RerankWidths)
  }

  test("recalls are probabilities over the shared 20-query truth") {
    rows.foreach { case (wd, nq, r1, r5) =>
      assert(nq === 20L, s"width $wd n_queries $nq")
      assert(r1 >= 0.0 && r1 <= 1.0, s"width $wd r@1 $r1")
      assert(r5 >= 0.0 && r5 <= 1.0, s"width $wd r@5 $r5")
    }
  }

  test("recall@5 is monotone non-decreasing in the shortlist width") {
    rows.sliding(2).foreach {
      case Seq((w1, _, _, r5a), (w2, _, _, r5b)) =>
        assert(r5b >= r5a, s"recall@5 fell $r5a -> $r5b from width $w1 to $w2")
      case _ =>
    }
  }
}
