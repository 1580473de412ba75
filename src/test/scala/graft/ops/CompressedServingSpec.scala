package graft.ops

import graft.SparkSpec

/** q153 — tombstone mask + metadata filter through the hier+PQ+rerank
  * chain. Pins the serving constraints hold through COMPRESSION (ADC
  * pricing never sees a masked or wrong-label candidate) and the
  * filtered-before-rank semantics that distinguish it from
  * post-filtering q136's finished list.
  */
class CompressedServingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val work = Dedup.stageRoot(dir)

  private def mtime(name: String): Long =
    new java.io.File(s"$work/$name/_SUCCESS").lastModified()

  test("q153 honors mask and filter through the compressed chain") {
    val labels = Similarity.scaledVectors(spark, dir)
      .select("vec_id", "label").as[(Long, Long)].collect().toMap
    val got = Similarity.q153CompressedServing(spark, dir)
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

  test("filtering before the shortlist serves at least as many rows as post-filtering q136's top-5") {
    // the filtered candidate stream's top-RerankShortlist is a superset
    // of the same-label survivors of the unfiltered shortlist, so per
    // query q153 must return >= the naive post-filter count — the
    // "post-filter silently under-returns" defect this entry avoids
    val labels = Similarity.scaledVectors(spark, dir)
      .select("vec_id", "label").as[(Long, Long)].collect().toMap
    val naive = Similarity.q136HierPqRerank(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
      .filter { case (q, n) =>
        q % 7 != 3 && n % 7 != 3 && labels(n) == labels(q) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val served = Similarity.q153CompressedServing(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.size).toMap
    naive.foreach { case (q, n) =>
      assert(served.getOrElse(q, 0) >= n,
        s"query $q: filtered-late would serve $n, q153 served ${served.getOrElse(q, 0)}")
    }
  }

  test("q153 never re-stages warm assets") {
    Similarity.q153CompressedServing(spark, dir).collect() // warm
    val marks = Seq("cells_hier", "probes_hier", "pq_codes",
      "pq_codebook", "deletes").map(mtime)
    Similarity.q153CompressedServing(spark, dir).collect()
    assert(Seq("cells_hier", "probes_hier", "pq_codes", "pq_codebook",
      "deletes").map(mtime) === marks, "q153 re-staged a warm asset")
  }
}
