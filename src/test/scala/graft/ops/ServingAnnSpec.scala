package graft.ops

import graft.SparkSpec

/** Production serving entries over the staged IVF index (q144/q145/
  * q146). Each test pins the SEMANTIC that distinguishes the operator
  * from a naive post-filter of q79's result list, plus the staged-
  * input discipline: after any query of the run has staged the index,
  * a serving entry never re-stages it (mtime of the parquet commit
  * marker, the q138/q140 spelling).
  */
class ServingAnnSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val work = Dedup.stageRoot(dir)

  private def mtime(name: String): Long =
    new java.io.File(s"$work/$name/_SUCCESS").lastModified()

  /** q79's staged multi-probe top-5, as (query → neighbor set). */
  private def baseline(): Map[Long, Set[Long]] =
    Similarity.q79AnnIvfMultiprobe(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().toSeq.groupBy(_._1)
      .map { case (q, rs) => (q, rs.map(_._2).toSet) }

  test("q144: deleted ids neither serve nor query, and the mask surfaces under-the-shortlist neighbors") {
    val base = baseline() // stages cells+probes as a side effect
    val (mc, mp) = (mtime("cells"), mtime("probes"))
    val got = Similarity.q144TombstoneAnn(spark, dir)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq
    assert(mtime("cells") === mc && mtime("probes") === mp,
      "q144 re-staged a warm index")
    assert(got.forall { case (q, _, n) => q % 7 != 3 && n % 7 != 3 },
      "a tombstoned id was served or queried")
    // every live query keeps serving; deleted queries are gone
    assert(got.map(_._1).toSet === base.keySet.filter(_ % 7 != 3))
    // ranks are assigned AFTER the mask: a query whose unfiltered
    // top-5 held a tombstone gains a neighbor q79 never returned
    // (post-filtering a stale list could only ever SHRINK)
    val gotSets = got.groupBy(_._1)
      .map { case (q, rs) => (q, rs.map(_._3).toSet) }
    val affected = base.filter { case (q, ns) =>
      q % 7 != 3 && ns.exists(_ % 7 == 3) }
    assert(affected.nonEmpty,
      "fixture drift: no live query had a tombstoned top-5 neighbor")
    assert(affected.exists { case (q, ns) =>
      (gotSets.getOrElse(q, Set.empty) -- ns).nonEmpty },
      "the mask never surfaced a replacement neighbor")
  }

  test("q145: the label filter rides the candidate join — it is not a post-filter of the top-5") {
    val base = baseline()
    val labels = Similarity.scaledVectors(spark, dir)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val (mc, mp) = (mtime("cells"), mtime("probes"))
    val got = Similarity.q145FilteredAnn(spark, dir)
      .select("query_id", "rank", "neighbor_id", "label")
      .as[(Long, Int, Long, Int)].collect().toSeq
    assert(mtime("cells") === mc && mtime("probes") === mp,
      "q145 re-staged a warm index")
    assert(got.forall { case (q, _, n, l) =>
      l === labels(q) && n != q && labels(n) === l },
      "a cross-label or self row was served")
    // ranks are dense per query (assigned after the filter)
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted === (1 to rs.size).toList)
    }
    // the pin: some query returns MORE same-label neighbors than its
    // unfiltered top-5 contains — a post-filter could never produce
    // them, the compound join key does
    val fromBase = base.map { case (q, ns) =>
      (q, ns.count(n => labels(n) == labels(q))) }
    val fromGot = got.groupBy(_._1).map { case (q, rs) => (q, rs.size) }
    assert(fromGot.exists { case (q, n) => n > fromBase.getOrElse(q, 0) },
      "filtered search never out-delivered the post-filtered baseline")
  }

  test("q146: RRF fusion is integer-exact, self-consistent, and genuinely two-source") {
    Similarity.q79AnnIvfMultiprobe(spark, dir).collect()
    val (mc, mp) = (mtime("cells"), mtime("probes"))
    val got = Similarity.q146HybridRrf(spark, dir)
      .select("query_id", "rank", "doc_id", "rrf_score", "vrank", "lrank")
      .as[(Long, Int, Long, Long, Option[Int], Option[Int])]
      .collect().toSeq
    assert(mtime("cells") === mc && mtime("probes") === mp,
      "q146 re-staged a warm index")
    val L = Similarity.RrfL
    def contrib(r: Option[Int]): Long = r.map(r => L / (60L + r)).getOrElse(0L)
    // the fused score is exactly the sum of the exact per-list
    // contributions — recomputable from the output row alone
    assert(got.forall { case (_, _, _, s, vr, lr) =>
      s === contrib(vr) + contrib(lr) && (vr.nonEmpty || lr.nonEmpty) })
    // rank order is (rrf_score desc, doc_id asc), dense from 1
    got.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) === (1 to rs.size).toList)
      sorted.sliding(2).foreach {
        case Seq((_, _, d1, s1, _, _), (_, _, d2, s2, _, _)) =>
          assert(s1 > s2 || (s1 === s2 && d1 < d2))
        case _ =>
      }
    }
    // both retrieval routes contribute somewhere in the fused set —
    // otherwise this is a one-list re-rank, not a fusion
    assert(got.exists(_._5.nonEmpty), "no vector-list row fused")
    assert(got.exists(_._6.nonEmpty), "no lexical-list row fused")
  }
}
