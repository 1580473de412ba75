package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The pairs→clusters step (q35/q36's engine): undirected connected
  * components by min-label propagation, electing min(id) as the
  * canonical survivor per dup cluster.
  */
class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(ps: (Long, Long)*): DataFrame =
    ps.toSeq.toDF("doc_a", "doc_b")

  private def clusters(df: DataFrame): Map[Long, Long] =
    Dedup.connectedComponents(df).as[(Long, Long)].collect().toMap

  test("two separate components each get their own min label") {
    val got = clusters(pairs(1L -> 2L, 2L -> 3L, 10L -> 11L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain converges past the first propagation round") {
    // a 12-node path has diameter 11: one round moves labels one hop,
    // so convergence requires genuinely iterating, not a single pass
    val chain = pairs((0L until 11L).map(i => i -> (i + 1)): _*)
    val got = clusters(chain)
    assert(got.size === 12)
    assert(got.values.toSet === Set(0L))
  }

  test("min label wins regardless of pair orientation") {
    // the small id appears only on the b side; symmetrization must
    // still propagate it as the component's label
    val got = clusters(pairs(7L -> 3L, 9L -> 7L))
    assert(got === Map(3L -> 3L, 7L -> 3L, 9L -> 3L))
  }

  test("star component: hub bridges leaves into one cluster") {
    val got = clusters(pairs(5L -> 50L, 5L -> 51L, 5L -> 52L, 60L -> 61L))
    assert(got === Map(5L -> 5L, 50L -> 5L, 51L -> 5L, 52L -> 5L,
      60L -> 60L, 61L -> 60L))
  }

  // ---- large-star/small-star variant ----

  private def starClusters(df: DataFrame, maxIters: Int = 40): Map[Long, Long] =
    Dedup.connectedComponentsStar(df, maxIters).as[(Long, Long)].collect().toMap

  test("star contraction agrees with min-label on every shape above") {
    for (ps <- Seq(
        pairs(1L -> 2L, 2L -> 3L, 10L -> 11L),
        pairs((0L until 11L).map(i => i -> (i + 1)): _*),
        pairs(7L -> 3L, 9L -> 7L),
        pairs(5L -> 50L, 5L -> 51L, 5L -> 52L, 60L -> 61L)))
      assert(starClusters(ps) === clusters(ps))
  }

  test("star contraction converges in O(log n) rounds where min-label needs O(diameter)") {
    // a 65-node path: min-label moves one hop per round, so a deep
    // graph throws at maxIters = 10 — but ONLY if the depth survives
    // the local pre-contraction: hash-scatter the edges across 64
    // partitions so each partition holds a near-matching (adjacent
    // chain edges rarely co-locate) and the contracted graph keeps
    // most of its diameter. Star contraction still finishes inside 10.
    val chain = pairs((0L until 64L).map(i => i -> (i + 1)): _*)
      .repartition(64, org.apache.spark.sql.functions.col("doc_a"))
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 10)
    }
    val got = starClusters(chain, maxIters = 10)
    assert(got.size === 65)
    assert(got.values.toSet === Set(0L))
  }

  test("local pre-contraction: a single-partition clique enters CC as a star, closure intact") {
    val g = 60
    val clique = (for {
      i <- 0L until g; j <- (i + 1) until g
    } yield (i + 100, j + 100)).toDF("doc_a", "doc_b").coalesce(1)
    // volume: C(60,2) = 1770 raw edges contract to g-1 = 59 stars
    val contracted = Dedup.locallyContracted(clique)
      .as[(Long, Long)].collect()
    assert(contracted.length === g - 1)
    assert(contracted.forall(_._1 == 100L))
    // and the closure the consumers see is unchanged
    val got = clusters(clique)
    assert(got.size === g && got.values.toSet === Set(100L))
  }

  test("local pre-contraction preserves self-loop singletons and cross-partition bridges") {
    // self-loop → singleton cluster (connectedComponents contract);
    // a component whose only bridge crosses partitions must survive
    val ps = pairs(5L -> 5L, 1L -> 2L, 2L -> 3L)
      .repartition(8, org.apache.spark.sql.functions.col("doc_b"))
    val got = clusters(ps)
    assert(got(5L) === 5L)
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L)
  }

  test("star contraction on disjoint random-ish components elects each minimum") {
    val got = starClusters(pairs(
      100L -> 7L, 7L -> 93L, 93L -> 100L, // triangle with min 7
      200L -> 201L, 201L -> 202L, 200L -> 202L, // triangle with min 200
      999L -> 3L)) // pair with min 3
    assert(got(100L) === 7L && got(93L) === 7L && got(7L) === 7L)
    assert(got(200L) === 200L && got(201L) === 200L && got(202L) === 200L)
    assert(got(999L) === 3L && got(3L) === 3L)
  }
}
