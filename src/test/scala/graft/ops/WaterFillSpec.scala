package graft.ops

import graft.SparkSpec

/** q183's water-filling cap — hand-computed planted cases plus the two
  * defining properties: the allocation saturates the budget to within
  * the sub-cap remainder (B − Σ alloc < #sources at the cap frontier)
  * and raising the cap by 1 would overshoot. Corners: budget covers
  * everything (no level lands → cap = max count), single source, and
  * a degenerate one-word-per-doc corpus.
  */
class WaterFillSpec extends SparkSpec {
  import spark.implicits._

  /** Build a documents dir whose per-source token counts are exactly
    * `counts` (each doc is `n` one-char words).
    */
  private def corpus(counts: Map[String, Long]): String = {
    val dir = java.nio.file.Files.createTempDirectory("waterfill").toString
    val rows = counts.toSeq.zipWithIndex.map { case ((src, n), i) =>
      (i.toLong, src, (1L to n).map(_ => "w").mkString(" "))
    }
    rows.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(counts: Map[String, Long]): Map[String, (Long, Long, Long, Boolean)] =
    Text.q183TokenBudget(spark, corpus(counts))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map { case (s, n, cap, alloc, capped) => s -> (n, cap, alloc, capped) }
      .toMap

  test("hand-computed landing level") {
    // counts 10, 20, 100 → total 130, budget 65. Ascending: (10, 20,
    // 100). Level 1: t = 65 div 3 = 21 ≥ 10 → funded. Level 2:
    // t = (65-10) div 2 = 27 ≥ 20 → funded. Level 3:
    // t = (65-30) div 1 = 35 < 100 → cap 35.
    val r = run(Map("a" -> 10L, "b" -> 20L, "c" -> 100L))
    assert(r("a") === ((10L, 35L, 10L, false)))
    assert(r("b") === ((20L, 35L, 20L, false)))
    assert(r("c") === ((100L, 35L, 35L, true)))
  }

  test("budget saturation and cap maximality on a spread of shapes") {
    val shapes = Seq(
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 997L),
      Map("a" -> 50L, "b" -> 50L),
      Map("only" -> 9L),
      Map("a" -> 3L, "b" -> 5L, "c" -> 8L, "d" -> 13L, "e" -> 21L))
    shapes.foreach { counts =>
      val total = counts.values.sum
      val budget = total / 2
      val r = run(counts)
      val cap = r.values.head._2
      val alloc = r.values.map(_._3).sum
      assert(r.values.forall { case (n, c, a, f) =>
        c == cap && a == math.min(n, cap) && f == (n > cap)
      }, s"$counts -> $r")
      assert(alloc <= budget, s"overshoot: $counts -> $r")
      // maximality: cap+1 would overshoot, unless the cap already
      // funds every source in full (the budget-covers-all corner)
      val allFunded = r.values.forall(!_._4)
      val next = counts.values.map(n => math.min(n, cap + 1)).sum
      assert(allFunded || next > budget, s"cap not maximal: $counts -> $r")
    }
  }

  test("single source halves exactly") {
    // with budget = total div 2 the no-landing branch (cap = max n)
    // is unreachable by construction — min(n,t)=total needs t ≥ max n
    // and B < total; the coalesce exists for API generality (a caller
    // raising the budget above total must not NULL the cap). The
    // single-source case pins the tightest landing: t = n div 2.
    val r = run(Map("solo" -> 8L))
    assert(r("solo") === ((8L, 4L, 4L, true)))
  }
}
