package graft.ops

import graft.SparkSpec

/** q168 — tombstone mask + metadata filter through the SQ8 serving
  * chain: the SQ8 row of the {layout} × {compression} × {constraints}
  * matrix (q153 is the hier+PQ row, q158 the sharded one). Pins that
  * the constraints hold through SCALAR quantization (the pricing never
  * sees a masked or wrong-label candidate) and the filtered-before-
  * shortlist semantics that distinguish it from post-filtering q167's
  * finished list.
  */
class Sq8ConstrainedSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val work = Dedup.stageRoot(dir)

  private def mtime(name: String): Long =
    new java.io.File(s"$work/$name/_SUCCESS").lastModified()

  test("q168 honors mask and filter through the SQ8 chain") {
    val labels = Similarity.scaledVectors(spark, dir)
      .select("vec_id", "label").as[(Long, Long)].collect().toMap
    val got = Similarity.q168Sq8Constrained(spark, dir)
      .select("query_id", "rank", "neighbor_id", "label")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (q, _, n, lab) =>
      assert(q % 7 != 3 && n % 7 != 3, s"tombstoned id in ($q, $n)")
      assert(n != q, "self-match served")
      assert(labels(n) === labels(q), s"cross-label row ($q, $n)")
      assert(lab === labels(q), "output label is not the query's")
    }
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted === (1 to rs.size).toList,
        s"ranks not dense for query $q")
    }
  }

  test("filtering before the shortlist serves at least as many rows as post-filtering q167's top-5") {
    // the filtered candidate stream's top-RerankShortlist is a superset
    // of the same-label survivors of the unfiltered shortlist, so per
    // query q168 must return >= the naive post-filter count
    val labels = Similarity.scaledVectors(spark, dir)
      .select("vec_id", "label").as[(Long, Long)].collect().toMap
    val naive = Similarity.q167Sq8Rerank(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
      .filter { case (q, n) =>
        q % 7 != 3 && n % 7 != 3 && labels(n) == labels(q) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val served = Similarity.q168Sq8Constrained(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.size).toMap
    naive.foreach { case (q, n) =>
      assert(served.getOrElse(q, 0) >= n,
        s"query $q: filtered-late would serve $n, q168 served ${served.getOrElse(q, 0)}")
    }
  }

  test("q168 never re-stages warm assets") {
    Similarity.q168Sq8Constrained(spark, dir).collect() // warm
    val names = Seq("cells", "probes", "sq_params", "sq_codes", "deletes")
    val marks = names.map(mtime)
    Similarity.q168Sq8Constrained(spark, dir).collect()
    assert(names.map(mtime) === marks, "q168 re-staged a warm asset")
  }
}
