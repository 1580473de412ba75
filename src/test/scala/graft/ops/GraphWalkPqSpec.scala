package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q194's PQ-priced graph walk — the {graph} × {compression} cell.
  * Pins, on planted codes/LUT frames (the walk's compressed pricing
  * is an input contract, so the spec drives it directly):
  *
  *  1. the ADC frontier rule: the walk advances by MIN quantized
  *     distance one hop per round — the chain target appears exactly
  *     when the round budget covers the chain, and the query itself
  *     never surfaces;
  *  2. the metric gap + recovery (q130's geometry through the graph):
  *     a candidate pair whose ADC order INVERTS the exact-cosine
  *     order — the quantized top-1 is wrong, and the exact re-rank of
  *     the ADC shortlist returns the true order;
  *  3. shortlist-recall semantics: the exact re-rank recovers ONLY
  *     what its shortlist retains — at width 1 the true neighbor
  *     (ADC rank 2) is unrecoverable, the honest bound every
  *     compressed route carries (q137's width logic). This is
  *     exactly why the shipped q194 re-ranks the ENTIRE bounded
  *     visited set (DiskANN's rerank-all rule; measured 0.75/0.69
  *     vs 0.50/0.44 for an ADC top-50 cut): the walk's candidate
  *     set is already shortlist-sized, so no ADC-ordered cut — which
  *     the quantizer misleads exactly as it misleads ranking — needs
  *     to sit between traversal and exactness.
  */
class GraphWalkPqSpec extends SparkSpec {
  import spark.implicits._

  // plant single-subspace codes: (vec_id, sub=0, code); the LUT gives
  // query 0's quantized distance per code
  private def codesDf(cs: (Long, Int)*): DataFrame =
    cs.map { case (v, c) => (v, 0, c) }.toDF("vec_id", "sub", "code")
  private def lutDf(pds: (Int, Long)*): DataFrame =
    pds.map { case (c, pd) => (0L, 0, c, pd) }
      .toDF("query_id", "sub", "code", "pd")

  test("ADC walk advances by min quantized distance, one hop per round") {
    // chain 10 -> 11 -> 12 -> 13 with strictly improving (falling)
    // ADC distance; 12 also points back at the query (suppressed)
    val probes = Seq((0L, 0L)).toDF("query_id", "cluster")
    val medoids = Seq((0L, 10L)).toDF("cluster", "medoid")
    val graph = Seq((10L, 11L), (11L, 12L), (12L, 13L), (12L, 0L))
      .toDF("node", "neighbor_id")
    val codes = codesDf(10L -> 0, 11L -> 1, 12L -> 2, 13L -> 3)
    val lut = lutDf(0 -> 100L, 1 -> 80L, 2 -> 50L, 3 -> 5L)
    def walk(rounds: Int): Seq[(Long, Long)] =
      Similarity.graphWalkVisitedAdc(probes, medoids, graph, codes,
          lut, rounds = rounds, beam = 1)
        .select(col("neighbor_id"), col("adc_dist"))
        .as[(Long, Long)].collect().toSeq.sortBy(_._2)
    val depth2 = walk(2)
    assert(!depth2.map(_._1).contains(13L),
      s"target is 3 hops out; 2 rounds must miss it: $depth2")
    val depth3 = walk(3)
    assert(depth3.head === ((13L, 5L)),
      s"3 rounds must reach the chain target at min adc: $depth3")
    assert(depth3.map(_._1).toSet === Set(10L, 11L, 12L, 13L),
      "every hop visited, the query itself never")
  }

  test("metric gap: ADC top-1 wrong, exact re-rank of the shortlist fixes it") {
    // medoid 10 fans out to 11 and 12. Quantization misprices them:
    // ADC says 11 < 12, exact cosine says 12 >> 11 (q130's planted
    // inversion, through the graph route)
    val probes = Seq((0L, 0L)).toDF("query_id", "cluster")
    val medoids = Seq((0L, 10L)).toDF("cluster", "medoid")
    val graph = Seq((10L, 11L), (10L, 12L)).toDF("node", "neighbor_id")
    val codes = codesDf(10L -> 0, 11L -> 1, 12L -> 2)
    val lut = lutDf(0 -> 100L, 1 -> 10L, 2 -> 20L)
    val vecs = Map( // exact geometry: q = [100, 0, 0]
      10L -> Array(0.0, 100.0, 0.0),
      11L -> Array(50.0, 50.0, 0.0),
      12L -> Array(99.0, 1.0, 0.0))
    val q = Array(100.0, 0.0, 0.0)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val visited = Similarity.graphWalkVisitedAdc(probes, medoids,
        graph, codes, lut, rounds = 1, beam = 1)
      .as[(Long, Long, Long)].collect().toSeq // (query, neighbor, adc)
      .map { case (_, n, a) => (n, a) }.sortBy(_._2)
    // the quantized ordering is the WRONG one
    assert(visited.map(_._1) === Seq(11L, 12L, 10L),
      s"planted ADC order must be 11 < 12 < 10: $visited")
    // exact re-rank of the width-2 ADC shortlist — the independent
    // plain-Scala referee — returns the true order
    val shortlist = visited.take(2).map(_._1)
    val reranked = shortlist.sortBy(n => (-cos(q, vecs(n)), n))
    assert(reranked === Seq(12L, 11L),
      "the exact tail must invert the quantized order")
    // width-1 shortlist: the true neighbor (ADC rank 2) is gone —
    // shortlist recall is the honest bound, exactly q137's semantics
    assert(visited.take(1).map(_._1) === Seq(11L))
  }
}
