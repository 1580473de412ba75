package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q189's greedy graph walk and its staged inputs. Pins:
  *
  *  1. medoid election: max cosine to the cell's floor-mean integer
  *     centroid, ties by lowest id (the staged `knn_medoids` asset is
  *     a walk INPUT the oracle reads, so its derivation is certified
  *     here — the stageCells precedent);
  *  2. round-by-round frontier progression: a planted edge chain with
  *     monotonically improving cosine is only reachable hop-by-hop,
  *     so the target appears exactly when the round budget covers the
  *     chain — rounds=2 misses it, rounds=3 finds it at rank 1;
  *  3. the query itself never appears in the walk's answer even when
  *     a graph edge points straight at it.
  */
class GraphWalkSpec extends SparkSpec {
  import spark.implicits._

  private def withNrm(df: DataFrame): DataFrame =
    df.withColumn("nrm",
      sqrt(Similarity.idot(col("v"), col("v")).cast("double")))

  test("medoid election: centroid-nearest member, ties by lowest id") {
    // cell 0: centroid floor([170/3,170/3,0]) = [56,56,0]; m3=[70,70,0]
    // is the closest member. cell 1: two IDENTICAL vectors — the tie
    // must elect the lower id (5).
    val iv = withNrm(Seq(
      (0L, 1L, Array(100L, 0L, 0L)), (0L, 2L, Array(0L, 100L, 0L)),
      (0L, 3L, Array(70L, 70L, 0L)),
      (1L, 5L, Array(10L, 10L, 10L)), (1L, 6L, Array(10L, 10L, 10L)))
      .toDF("cluster", "vec_id", "v"))
    val med = Similarity.cellMedoids(iv.localCheckpoint())
      .as[(Long, Long)].collect().toMap
    assert(med(0L) === 3L && med(1L) === 5L)
  }

  test("walk advances one graph hop per round and finds the chain target exactly at depth") {
    // query q=[100,0,0]; seed medoid 10 is orthogonal to q; the chain
    // 10 -> 11 -> 12 -> 13 improves cosine each hop; 12 also points
    // back at the query itself (must be suppressed)
    val queries = withNrm(Seq((0L, Array(100L, 0L, 0L)))
        .toDF("query_id", "v"))
      .select(col("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val iv = withNrm(Seq(
      (0L, Array(100L, 0L, 0L)),
      (10L, Array(0L, 100L, 0L)), (11L, Array(50L, 87L, 0L)),
      (12L, Array(87L, 50L, 0L)), (13L, Array(99L, 5L, 0L)))
      .toDF("vec_id", "v"))
    val probes = Seq((0L, 0L)).toDF("query_id", "cluster")
    val medoids = Seq((0L, 10L)).toDF("cluster", "medoid")
    val graph = Seq((10L, 11L), (11L, 12L), (12L, 13L), (12L, 0L))
      .toDF("node", "neighbor_id")
    def walk(rounds: Int) =
      Similarity.graphWalkOf(queries, probes, medoids, graph,
          iv.localCheckpoint(), rounds = rounds, beam = 1, topK = 5)
        .select(col("rank"), col("neighbor_id"))
        .as[(Int, Long)].collect().toSeq
    val depth2 = walk(2)
    assert(!depth2.map(_._2).contains(13L),
      s"target is 3 hops out; 2 rounds must miss it: $depth2")
    val depth3 = walk(3)
    assert(depth3.head === ((1, 13L)),
      s"3 rounds must find the chain target at rank 1: $depth3")
    // visited accumulates: every hop of the chain is in the answer,
    // the query itself never is
    assert(depth3.map(_._2).toSet === Set(13L, 12L, 11L, 10L))
  }

  test("tombstones mask results but stay navigable (q192's FreshDiskANN rule)") {
    // the same chain, with the INTERMEDIATE hop 11 and the target's
    // predecessor 12 tombstoned: reaching 13 REQUIRES expanding both
    // tombstoned nodes, and the answer re-ranks over survivors only
    val queries = withNrm(Seq((0L, Array(100L, 0L, 0L)))
        .toDF("query_id", "v"))
      .select(col("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val iv = withNrm(Seq(
      (0L, Array(100L, 0L, 0L)),
      (10L, Array(0L, 100L, 0L)), (11L, Array(50L, 87L, 0L)),
      (12L, Array(87L, 50L, 0L)), (13L, Array(99L, 5L, 0L)))
      .toDF("vec_id", "v"))
    val probes = Seq((0L, 0L)).toDF("query_id", "cluster")
    val medoids = Seq((0L, 10L)).toDF("cluster", "medoid")
    val graph = Seq((10L, 11L), (11L, 12L), (12L, 13L))
      .toDF("node", "neighbor_id")
    val del = Seq(11L, 12L).toDF("vec_id")
    val got = Similarity.graphWalkOf(queries, probes, medoids, graph,
        iv.localCheckpoint(), rounds = 3, beam = 1, topK = 5,
        mask = Some(del))
      .select(col("rank"), col("neighbor_id"))
      .as[(Int, Long)].collect().toSeq
    // 13 is only reachable THROUGH the tombstones; ranks re-drawn
    // over the survivors {13, 10}
    assert(got === Seq((1, 13L), (2, 10L)))
    // label filter (q193's rule): traversal unfiltered, answers keep
    // only the query's label, ranks re-drawn, under-fill accepted —
    // with 13 and 11 labeled B and the query A, only {12, 10} answer
    val labels = Seq((0L, "A"), (10L, "A"), (11L, "B"), (12L, "A"),
      (13L, "B")).toDF("vec_id", "label")
    val filteredGot = Similarity.labelFilteredWalkRank(
        Similarity.graphWalkVisited(queries, probes, medoids, graph,
          iv.localCheckpoint(), rounds = 3, beam = 1),
        labels, topK = 5)
      .select(col("rank"), col("neighbor_id"), col("label"))
      .as[(Int, Long, String)].collect().toSeq
    assert(filteredGot === Seq((1, 12L, "A"), (2, 10L, "A")),
      s"filtered walk must keep A-labeled survivors only: $filteredGot")

    // a tombstoned QUERY is masked to zero rows (the q144 contract)
    val gotMaskedQuery = Similarity.graphWalkOf(
        queries.join(broadcast(Seq(0L).toDF("query_id")),
          Seq("query_id"), "left_anti"),
        probes, medoids, graph, iv.localCheckpoint(),
        rounds = 3, beam = 1, topK = 5, mask = Some(del))
      .count()
    assert(gotMaskedQuery === 0L)
  }
}
