package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q159 — Matryoshka-prefix serving (the q133 report executed). Pins
  * the property that makes a separately-stored prefix tier safe: the
  * pricing is TAIL-BLIND (components past [[Similarity.MatryoshkaServeDim]]
  * cannot change the shortlist), that prefix ordering — not full-dim
  * ordering — decides shortlist membership, and the real-table
  * serving contract (dense ranks, exact-cosine final order).
  */
class MatryoshkaServingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def frame(rows: Seq[(Long, Long, Seq[Long])]) =
    rows.toDF("vec_id", "cluster", "v")

  test("pricing is tail-blind: mutating components past the prefix keeps the shortlist") {
    val d = 4
    // candidate 10 beats 11 on the 4-dim prefix; their tails differ wildly
    val corpus = frame(Seq(
      (10L, 0L, Seq(5L, 5, 5, 5, 100, 100, 100, 100)),
      (11L, 0L, Seq(5L, 5, 5, 4, -100, -100, -100, -100)),
      (12L, 0L, Seq(-5L, -5, -5, -5, 0, 0, 0, 0))))
    val probes = frame(Seq((1L, 0L, Seq(5L, 5, 5, 5, 0, 0, 0, 0))))
      .withColumnRenamed("vec_id", "query_id")
    val base = Similarity.matryoshkaShortlist(probes, corpus, d, 2)
      .as[(Long, Long)].collect().toSet
    assert(base === Set((1L, 10L), (1L, 11L)))
    // zero every tail: the shortlist must not move
    val tailless = frame(Seq(
      (10L, 0L, Seq(5L, 5, 5, 5, 0, 0, 0, 0)),
      (11L, 0L, Seq(5L, 5, 5, 4, 0, 0, 0, 0)),
      (12L, 0L, Seq(-5L, -5, -5, -5, 0, 0, 0, 0))))
    assert(Similarity.matryoshkaShortlist(probes, tailless, d, 2)
      .as[(Long, Long)].collect().toSet === base)
    // but mutating a PREFIX component does move it: 12 flips positive
    // and displaces 11
    val prefixFlip = frame(Seq(
      (10L, 0L, Seq(5L, 5, 5, 5, 100, 100, 100, 100)),
      (11L, 0L, Seq(5L, 5, 5, 4, -100, -100, -100, -100)),
      (12L, 0L, Seq(5L, 5, 5, 5, 0, 0, 0, 0))))
    assert(Similarity.matryoshkaShortlist(probes, prefixFlip, d, 2)
      .as[(Long, Long)].collect().toSet === Set((1L, 10L), (1L, 12L)))
  }

  test("shortlist membership is decided by the prefix even when the full dims disagree") {
    val d = 4
    // 20's prefix is orthogonal to the query but its full-dim cosine is
    // high; 21's prefix matches but its full vector is poor. Width 1
    // must keep 21 — the prefix tier's honest trade, recovered only by
    // widening (q137's knob), never by peeking at the tail.
    val corpus = frame(Seq(
      (20L, 0L, Seq(0L, 0, 0, 1, 50, 50, 50, 50)),
      (21L, 0L, Seq(9L, 9, 9, 9, -1, -1, -1, -1))))
    val probes = frame(Seq((1L, 0L, Seq(9L, 9, 9, 9, 50, 50, 50, 50))))
      .withColumnRenamed("vec_id", "query_id")
    assert(Similarity.matryoshkaShortlist(probes, corpus, d, 1)
      .as[(Long, Long)].collect().toSeq === Seq((1L, 21L)))
  }

  test("q159 on the real table: dense ranks, no self-matches, exact-cosine descending") {
    val got = Similarity.q159MatryoshkaServing(spark, dir)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (q, _, n, _) => assert(n != q, "self-match served") }
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted === (1 to rs.size).toList,
        s"ranks not dense for query $q")
      val ordered = rs.sortBy(_._2).map(_._4)
      assert(ordered === ordered.sorted(Ordering[Double].reverse),
        s"final order not by exact cosine for query $q")
    }
  }
}
