package graft.ops

import graft.SparkSpec

/** MMR diversified re-rank (q147) on a planted redundancy geometry:
  *
  *   - query 5       = e0 + e1
  *   - twins 20..25  = e0 + 0.1·e1 (+ tiny id-keyed jitter in a dim
  *     the query is zero in) — rel ≈ 0.774, mutually ≈ identical
  *   - diverse 30    = e1 — rel ≈ 0.707, sim to any twin ≈ 0.0995
  *   - fillers 40..51 in orthogonal blocks (give Lloyd real cells)
  *
  * Pure relevance ranks all six twins above the diverse vector, so
  * the plain top-5 is five copies of the same answer. At λ = 0.7 the
  * second MMR step scores a twin 0.7·0.774 − 0.3·1 ≈ 0.24 against
  * the diverse vector's 0.7·0.707 − 0.3·0.0995 ≈ 0.47 — the greedy
  * selection MUST pull in the diverse vector while a redundant
  * shortlist cannot. That inversion is the operator's reason to
  * exist, and no sf-data accident can produce it.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def vec(parts: (Int, Float)*): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    parts.foreach { case (i, x) => a(i) = x }
    a
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-mmr").toString
    val twins = (0 until 6).map(i =>
      ((20 + i).toLong, vec(0 -> 1.0f, 8 -> 0.1f, 63 -> (0.001f * (i + 1))), 0))
    val fillers = (0 until 6).map(i =>
      ((40 + i).toLong, vec(16 -> 1.0f, 63 -> (0.001f * (i + 1))), 0)) ++
      (0 until 6).map(i =>
        ((46 + i).toLong, vec(24 -> 1.0f, 62 -> (0.001f * (i + 1))), 0))
    (twins ++ fillers ++ Seq(
      (5L, vec(0 -> 1.0f, 8 -> 1.0f), 0),  // the query
      (30L, vec(8 -> 1.0f), 0)))           // the diverse answer
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("pure-relevance top-5 is all twins; MMR swaps one for the diverse vector") {
    val plain = Similarity.q79AnnIvfMultiprobe(spark, dir)
      .where($"query_id" === 5L)
      .select("neighbor_id").as[Long].collect().toSet
    assert(plain.forall(id => id >= 20L && id <= 25L),
      s"fixture drift: plain top-5 should be twins only, got $plain")
    val mmr = Similarity.q147MmrDiversify(spark, dir)
      .where($"query_id" === 5L)
      .select("step", "neighbor_id").as[(Int, Long)].collect().toSeq
      .sortBy(_._1)
    assert(mmr.map(_._1) === (1 to 5).toList)
    assert(mmr.map(_._2).distinct.size === 5, "duplicate selection")
    // step 1 is the plain top-1 (MMR degenerates to relevance there)
    val top1 = Similarity.q79AnnIvfMultiprobe(spark, dir)
      .where($"query_id" === 5L && $"rank" === 1)
      .select("neighbor_id").as[Long].head()
    assert(mmr.head._2 === top1)
    // the diversity inversion: step 2 must already prefer the diverse
    // vector over the five remaining near-identical twins
    assert(mmr(1)._2 === 30L,
      s"MMR step 2 kept a redundant twin: $mmr")
    assert(mmr.map(_._2).contains(30L))
  }

  test("on the real table MMR step-1s equal the plain top-1s and selections stay in-pool") {
    val real = "/root/testdata/sf0.001"
    val plainTop1 = Similarity.q79AnnIvfMultiprobe(spark, real)
      .where($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val mmr = Similarity.q147MmrDiversify(spark, real)
      .select("query_id", "step", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq
    val firsts = mmr.filter(_._2 == 1).map(t => (t._1, t._3)).toMap
    assert(firsts === plainTop1)
    // every selected id came from the entry's OWN candidate generator
    // (the top-MmrPool pool; later steps may dig below the plain top-5
    // — that is the point — but never outside the pool)
    val pool = Similarity.mmrCandidatePool(spark, real)
      .select("query_id", "cand").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, rs) => (q, rs.map(_._2).toSet) }
    mmr.foreach { case (q, step, id) =>
      assert(pool.getOrElse(q, Set.empty).contains(id),
        s"query $q step $step selected $id outside the candidate pool")
    }
    mmr.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).distinct.size === rs.size, s"dup in query $q")
    }
  }
}
