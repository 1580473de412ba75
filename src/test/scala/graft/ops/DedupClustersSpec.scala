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
}
