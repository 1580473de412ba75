package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q195's graph-family compaction + q196's walk escalation. Unlike
  * q154's assign-only compaction (cells ∖ deletes — masked ==
  * compacted BY CONSTRUCTION), a graph compaction re-ROUTES: edges
  * re-aim at survivors and medoids re-elect, so q192-identity is a
  * data property, not mechanism (measured 72/85 common top-5
  * neighbors at sf0.01 — SCALING.md). What IS mechanism, pinned here
  * on the real corpus:
  *
  *  1. the compacted graph, medoids, and answers contain NO
  *     tombstoned id anywhere — compaction consumed the feed;
  *  2. deleted QUERY ids are masked (q144's serving contract);
  *  3. the truncated feed (`graph_deletes_compacted`) is empty while
  *     the original `deletes` stays staged for the masked replays;
  *  4. the compacted pair is group-stamped with BOTH source versions
  *     (cells + deletes);
  *  5. q195 and q192 serve the SAME query set (the survivors) at full
  *     depth — re-routing changes picks, never coverage.
  */
class GraphCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("compacted graph family is tombstone-free; feed truncated; stamps recorded") {
    val work = Dedup.stageRoot(dir)
    val got = Similarity.q195GraphCompactedWalk(spark, dir)
      .localCheckpoint()
    val deletes = spark.read.parquet(Staged.path(work, "deletes"))
      .as[Long].collect().toSet
    assert(deletes.nonEmpty)

    // 1. no tombstone anywhere in the compacted assets or the answers
    val g = spark.read.parquet(Staged.path(work, "knn_graph_compact"))
    assert(g.where(col("query_id").isin(deletes.toSeq: _*) ||
      col("neighbor_id").isin(deletes.toSeq: _*)).count() === 0L)
    val m = spark.read.parquet(Staged.path(work, "knn_medoids_compact"))
    assert(m.where(col("medoid").isin(deletes.toSeq: _*)).count() === 0L)
    assert(got.where(col("neighbor_id").isin(deletes.toSeq: _*))
      .count() === 0L)

    // 2. deleted query ids masked; survivors served at full depth
    assert(got.where(col("query_id").isin(deletes.toSeq: _*))
      .count() === 0L)

    // 3. the consumed feed is truncated; the original stays staged
    assert(spark.read.parquet(
      Staged.path(work, "graph_deletes_compacted")).count() === 0L)
    assert(deletes.nonEmpty) // read above, still staged

    // 4. stamped with both source versions
    val stamp = Staged.groupOf(work, "knn_graph_compact")
    assert(stamp.exists(s => s.contains("cells=") && s.contains("deletes=")),
      s"stamp must record both sources: $stamp")

    // 5. same query coverage as the masked walk — re-routing changes
    // picks, never which survivors get answers or how many
    val masked = Similarity.q192GraphWalkMasked(spark, dir)
      .localCheckpoint()
    val gq = got.groupBy(col("query_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val mq = masked.groupBy(col("query_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(gq.keySet === mq.keySet,
      s"query coverage must match: ${gq.keySet} vs ${mq.keySet}")
    assert(gq === mq, "both serve full depth per surviving query")
  }

  test("walk escalation: deficient query re-walks at 2x beam and fills; satisfied one untouched") {
    def withNrm(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("nrm",
        sqrt(Similarity.idot(col("v"), col("v")).cast("double")))
    // query 0 (label A) seeds at B-labeled medoid 10. Branch 1 (best
    // cosine) is all label B; the A-labeled pool hangs off the WORSE
    // branch 2 — beam 1 never expands it, beam 2 does. Query 1
    // (label C) fills at beam 1 and must keep its narrow answer.
    val queries = withNrm(Seq(
      (0L, Array(100L, 0L, 0L)), (1L, Array(0L, 0L, 100L)))
      .toDF("query_id", "v"))
      .select(col("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val iv = withNrm(Seq(
      (10L, Array(0L, 100L, 0L)), (11L, Array(87L, 50L, 0L)),
      (12L, Array(99L, 5L, 0L)), (21L, Array(30L, 95L, 0L)),
      (22L, Array(60L, 80L, 0L)), (23L, Array(50L, 86L, 0L)),
      (30L, Array(10L, 10L, 99L)), (31L, Array(0L, 20L, 98L)))
      .toDF("vec_id", "v"))
    val probes = Seq((0L, 0L), (1L, 1L)).toDF("query_id", "cluster")
    val medoids = Seq((0L, 10L), (1L, 30L)).toDF("cluster", "medoid")
    val graph = Seq((10L, 11L), (11L, 12L), (10L, 21L), (21L, 22L),
      (21L, 23L), (30L, 31L)).toDF("node", "neighbor_id")
    val labels = Seq((0L, "A"), (1L, "C"), (10L, "B"), (11L, "B"),
      (12L, "B"), (21L, "A"), (22L, "A"), (23L, "A"), (30L, "C"),
      (31L, "C")).toDF("vec_id", "label")
    val got = Similarity.escalatedFilteredWalk(queries, probes,
        medoids, graph, iv.localCheckpoint(), labels,
        rounds = 2, beam = 1, topK = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("label"), col("escalated"))
      .as[(Long, Int, Long, String, Boolean)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    // beam 1 reaches only {10, 11, 21, 12}: one A-match (21) < topK →
    // query 0 escalates; beam 2 expands branch 2 and the A-pool fills
    // to (22, 23) by cosine. Query 1 fills at beam 1 (30, 31) and
    // keeps escalated = false.
    assert(got === Seq(
      (0L, 1, 22L, "A", true), (0L, 2, 23L, "A", true),
      (1L, 1, 30L, "C", false), (1L, 2, 31L, "C", false)), got.toString)
  }
}
