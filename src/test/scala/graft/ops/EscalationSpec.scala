package graft.ops

import graft.SparkSpec

/** q156 — the under-fill escalation ladder. Plants the thin-pool
  * geometry the verdict asked for (a query whose filtered pool at the
  * serving width is thinner than K but fills to K at the wide width)
  * and pins the keep-side guarantee (satisfied queries' narrow answers
  * survive byte-for-byte) on both planted and real data.
  */
class EscalationSpec extends SparkSpec {
  import spark.implicits._

  private def vec = Seq.fill(64)(1L)
  private val nrm = math.sqrt(64.0)

  test("a planted thin-pool query fills to K on escalation; a satisfied query keeps its narrow answer") {
    // label 1: only 2 candidates in the narrow cluster, 4 more behind
    // the wide probes; label 2: 6 candidates all in the narrow cluster
    val corpus = Seq(
      (10L, 1L, 0, vec, nrm), (11L, 1L, 0, vec, nrm),
      (12L, 1L, 1, vec, nrm), (13L, 1L, 1, vec, nrm),
      (14L, 1L, 2, vec, nrm), (15L, 1L, 2, vec, nrm),
      (20L, 2L, 0, vec, nrm), (21L, 2L, 0, vec, nrm),
      (22L, 2L, 0, vec, nrm), (23L, 2L, 0, vec, nrm),
      (24L, 2L, 0, vec, nrm), (25L, 2L, 0, vec, nrm))
      .toDF("vec_id", "label", "cluster", "v", "nrm")
    val narrow = Seq((100L, 1L, 0, vec, nrm), (200L, 2L, 0, vec, nrm))
      .toDF("query_id", "qlabel", "cluster", "qv", "qn")
    val wide = Seq(
      (100L, 1L, 0, vec, nrm), (100L, 1L, 1, vec, nrm),
      (100L, 1L, 2, vec, nrm),
      (200L, 2L, 0, vec, nrm), (200L, 2L, 1, vec, nrm),
      (200L, 2L, 2, vec, nrm))
      .toDF("query_id", "qlabel", "cluster", "qv", "qn")
    val got = Similarity.escalateFiltered(narrow, wide, corpus, topK = 5)
      .select("query_id", "rank", "neighbor_id", "escalated")
      .as[(Long, Int, Long, Boolean)].collect().toSeq
    val q100 = got.filter(_._1 == 100L).sortBy(_._2)
    assert(q100.size === 5, s"thin pool did not fill to K: $q100")
    assert(q100.forall(_._4), "q100's rows must be marked escalated")
    // equal cosines tie-break by neighbor_id: the 5 lowest-id label-1s
    assert(q100.map(_._3) === Seq(10L, 11L, 12L, 13L, 14L))
    val q200 = got.filter(_._1 == 200L).sortBy(_._2)
    assert(q200.size === 5)
    assert(q200.forall(!_._4), "a satisfied query must not escalate")
    assert(q200.map(_._3) === Seq(20L, 21L, 22L, 23L, 24L))
  }

  test("q156 on the real table: kept rows equal q145's, escalated queries never shrink, everything same-label") {
    val dir = "/root/testdata/sf0.001"
    val labels = Similarity.scaledVectors(spark, dir)
      .select("vec_id", "label").as[(Long, Long)].collect().toMap
    val narrow = Similarity.q145FilteredAnn(spark, dir)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq.groupBy(_._1)
    val got = Similarity.q156EscalatedFiltered(spark, dir)
      .select("query_id", "rank", "neighbor_id", "escalated")
      .as[(Long, Int, Long, Boolean)].collect().toSeq
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).distinct.size === 1,
        s"query $q mixes escalated and kept rows")
      assert(rs.size <= 5)
      if (rs.head._4) {
        // escalation fires only on genuinely deficient queries and
        // may only widen the answer
        assert(narrow.getOrElse(q, Nil).size < 5, s"query $q escalated needlessly")
        assert(rs.size >= narrow.getOrElse(q, Nil).size, s"query $q shrank")
      } else {
        // kept side is q145's answer byte-for-byte
        assert(rs.map(t => (t._2, t._3)).toSet
          === narrow(q).map(t => (t._2, t._3)).toSet, s"query $q drifted")
        assert(rs.size === 5)
      }
      rs.foreach { case (_, _, n, _) =>
        assert(labels(n) === labels(q), s"cross-label row ($q, $n)") }
    }
  }
}
