package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q188's NN-descent round over the bridged k-NN graph. Pins, in
  * order of what could silently break:
  *
  *  1. the CROSS-CELL recovery the family exists for (the q120
  *     boundary geometry, pushed one cell further): u's true nearest
  *     neighbor w sits TWO cells away (u ∈ A, w ∈ C, adj(A)=B,
  *     adj(B)=C), so neither the in-cell graph nor u's own bridge can
  *     reach it — only bridge-then-graph composition inside the
  *     descent's 2-hop does, and the exact re-score must then rank w
  *     FIRST;
  *  2. centroid adjacency: the planted cells' floor-mean integer
  *     centroids elect exactly adj(A)=B, adj(B)=C (hand-computed);
  *  3. the reverse cap: a hub with more in-edges than
  *     [[Similarity.DescentReverseCap]] keeps only the cap smallest
  *     sources in the substrate, so a 2-hop THROUGH the hub sees a
  *     bounded neighbor list — the dup-star guard (without it a
  *     10^5-copy group prices 10^10 pairs through its min-id hubs).
  */
class KnnDescentSpec extends SparkSpec {
  import spark.implicits._

  private def withNrm(df: DataFrame): DataFrame =
    df.withColumn("nrm",
      sqrt(Similarity.idot(col("v"), col("v")).cast("double")))

  /** The 3-cell boundary plant (hand-computed in the suite scaladoc):
    * cell 0: u=1:[100,0,0], a2=2:[99,5,0]
    * cell 1: b1=10:[70,70,0], b2=11:[71,69,0]
    * cell 2: w=20:[98,3,0] (u's TRUE nearest: cos 0.99949 vs a2's
    *         0.99874), c2=21:[0,100,30], c3=22:[0,100,-30] (they drag
    *         C's centroid away from A so adj(A)=B, adj(B)=C)
    */
  private def corpus: DataFrame = withNrm(Seq(
    (0L, 1L, Array(100L, 0L, 0L)), (0L, 2L, Array(99L, 5L, 0L)),
    (1L, 10L, Array(70L, 70L, 0L)), (1L, 11L, Array(71L, 69L, 0L)),
    (2L, 20L, Array(98L, 3L, 0L)), (2L, 21L, Array(0L, 100L, 30L)),
    (2L, 22L, Array(0L, 100L, -30L))).toDF("cluster", "vec_id", "v"))

  test("centroid adjacency elects the planted chain adj(A)=B, adj(B)=C") {
    val adj = Similarity.cellAdjacency(corpus.localCheckpoint())
      .as[(Long, Long)].collect().toMap
    assert(adj(0L) === 1L && adj(1L) === 2L && adj(2L) === 1L)
  }

  test("descent recovers a true neighbor two cells away that blocking and bridges both miss") {
    val iv = corpus.localCheckpoint()
    // the in-cell graph alone: u's list is its only cellmate
    val base = Similarity.knnGraphOf(iv, k = 3)
    assert(base.where(col("query_id") === 1).select(col("neighbor_id"))
      .as[Long].collect().toSeq === Seq(2L))
    // u's own bridge reaches B (cos 0.72), not w ∈ C
    val bridges = Similarity.bridgeEdges(iv, Similarity.cellAdjacency(iv))
    assert(bridges.where(col("query_id") === 1).select(col("neighbor_id"))
      .as[Long].collect().toSeq === Seq(11L))
    // one descent round: u → bridge(b2) → bridge(w) lands w in the
    // candidate set and the exact re-score ranks it FIRST
    val refined = Similarity.knnDescentOf(iv,
      base.select(col("query_id"), col("neighbor_id")).union(bridges),
      k = 3)
    val u = refined.where(col("query_id") === 1)
      .orderBy(col("rank")).select(col("neighbor_id"))
      .as[Long].collect().toSeq
    assert(u.head === 20L, s"descent must rank w first, got $u")
    assert(u === Seq(20L, 2L, 11L))
  }

  test("convergence-driven descent recovers a 3-hop neighbor one round provably misses") {
    // planted path u → m1 → m2 → w with w = u's true nearest
    // (cos 0.9987 vs m1's 0.8): one round's candidate horizon is
    // 2 hops (neighbors-of-neighbors), so round 1 CANNOT see w from
    // u; round 2 reaches it through m2's refined list and the exact
    // re-score ranks it first. The convergence loop must therefore
    // keep iterating past round 1 and stop once the edge set dries.
    val iv = withNrm(Seq(
      (0L, 1L, Array(100L, 0L, 0L)),   // u
      (0L, 10L, Array(80L, 60L, 0L)),  // m1
      (0L, 11L, Array(60L, 80L, 0L)),  // m2
      (0L, 20L, Array(99L, 5L, 0L)))   // w
      .toDF("cluster", "vec_id", "v")).localCheckpoint()
    val path = Seq((1L, 10L), (10L, 11L), (11L, 20L))
      .toDF("query_id", "neighbor_id")
    val oneRound = Similarity.knnDescentOf(iv, path, k = 3)
    val u1 = oneRound.where(col("query_id") === 1)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(!u1.contains(20L),
      s"one round must miss the 3-hop neighbor, got $u1")
    val conv = Similarity.knnDescentConverged(iv, path, k = 3)
      .localCheckpoint()
    val uc = conv.where(col("query_id") === 1)
      .orderBy(col("rank")).select(col("neighbor_id"))
      .as[Long].collect().toSeq
    assert(uc.head === 20L, s"converged descent must rank w first: $uc")
    val rounds = Similarity.lastDescentRounds
    assert(rounds >= 2 && rounds <= Similarity.DescentMaxRounds,
      s"planted chain should converge in a few rounds, ran $rounds")

    // idempotence: a converged graph is a descent fixpoint — feeding
    // its own edges back converges immediately (one confirming round)
    val again = Similarity.knnDescentConverged(iv,
      conv.select(col("query_id"), col("neighbor_id")), k = 3)
    assert(Similarity.lastDescentRounds === 2)
    assert(again.select(col("query_id"), col("neighbor_id"))
      .exceptAll(conv.select(col("query_id"), col("neighbor_id")))
      .count() === 0L)

    // the cap is a backstop, not the terminator: maxRounds = 1
    // returns exactly the single-round graph
    val capped = Similarity.knnDescentConverged(iv, path, k = 3,
      maxRounds = 1)
    assert(Similarity.lastDescentRounds === 1)
    assert(capped.select(col("query_id"), col("neighbor_id"))
      .exceptAll(oneRound.select(col("query_id"), col("neighbor_id")))
      .count() === 0L)
  }

  test("reverse cap bounds a hub's substrate in-list to the cap smallest sources") {
    // six nodes all point at hub 100; hub points at 200. After the
    // capped symmetrization the hub's neighbor list is {200} plus the
    // 3 smallest sources {1,2,3}, so a 2-hop through the hub from
    // node 4 sees 1,2,3 (and 200) but never 5 or 6.
    val iv = withNrm((Seq(100L, 200L) ++ (1L to 6L)).map(i =>
        (0L, i, Array(i, 1L, 0L)))
      .toDF("cluster", "vec_id", "v"))
    val edges = ((1L to 6L).map(i => (i, 100L)) :+ (100L, 200L))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.knnDescentOf(iv.localCheckpoint(), edges,
      k = 8, cap = 3)
    val four = out.where(col("query_id") === 4)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(four.contains(100L) && four.contains(200L))
    assert(Set(1L, 2L, 3L).subsetOf(four),
      s"capped sources must flow through the 2-hop, got $four")
    assert(!four.contains(5L) && !four.contains(6L),
      s"sources beyond the cap must NOT flow through the hub, got $four")
  }
}
