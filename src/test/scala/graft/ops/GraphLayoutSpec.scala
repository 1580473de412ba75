package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q197's bucketed-substrate walk. The oracle already certifies
  * pruned-serve == recurrence (it re-derives the walk from
  * `knn_graph`); what this spec pins on the real corpus:
  *
  *  1. q197 == q189 row-for-row — layout and pruning are invisible
  *     to results BY CONSTRUCTION (every frontier node's edges live
  *     in its bucket), and this is the assertion that makes the
  *     claim mechanical rather than oracle-coincidental;
  *  2. the staged substrate equals [[Similarity.walkSubstrate]] over
  *     the staged graph exactly (same edge set, every row's `nb` and
  *     `neighbor_nb` = the shared cell-aligned sub-split formula
  *     [[Similarity.walkBucketExpr]] — the round-17 layout) and is
  *     group-stamped to the `knn_graph` AND `cells` versions it
  *     derives from;
  *  3. the layout is REAL: the version dir holds one `nb=` partition
  *     directory per touched bucket.
  */
class GraphLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pruned bucketed walk == flat walk row-for-row; substrate exact and stamped") {
    val work = Dedup.stageRoot(dir)
    val pruned = Similarity.q197GraphWalkPruned(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val flat = Similarity.q189GraphWalk(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(pruned.nonEmpty)
    assert(pruned === flat, "layout must be invisible to results")

    // substrate content == the derivation, bucket column included
    val bkt = spark.read.parquet(Staged.path(work, "knn_graph_bkt"))
    val derived = {
      val g0 = spark.read.parquet(Staged.path(work, "knn_graph"))
      val fwd = g0.select(col("query_id").as("node"), col("neighbor_id"))
      val rev = g0.withColumn("r",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("neighbor_id")).orderBy(col("query_id"))))
        .where(col("r") <= Similarity.DescentReverseCap)
        .select(col("neighbor_id").as("node"),
          col("query_id").as("neighbor_id"))
      fwd.union(rev).distinct()
    }
    assert(bkt.select(col("node"), col("neighbor_id"))
      .exceptAll(derived).count() === 0L)
    assert(derived.exceptAll(
      bkt.select(col("node"), col("neighbor_id"))).count() === 0L)
    // cell-aligned buckets through the SHARED formula (sub-split for
    // small cell counts): nb keys on the node's IVF cell, and each
    // edge carries its target's bucket (the walk's layout pointer)
    val nCells = spark.read.parquet(Staged.path(work, "knn_medoids"))
      .count()
    val nbOf = spark.read.parquet(Staged.path(work, "cells"))
      .select(col("vec_id"),
        Similarity.walkBucketExpr(col("cluster"), col("vec_id"), nCells)
          .as("cnb"))
    assert(bkt.join(nbOf.withColumnRenamed("vec_id", "node"), "node")
      .where(col("nb") =!= col("cnb")).count() === 0L)
    assert(bkt.join(nbOf.withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id")
      .where(col("neighbor_nb") =!= col("cnb")).count() === 0L)

    // stamped to BOTH source generations; physically partitioned
    val stamp = Staged.groupOf(work, "knn_graph_bkt")
    assert(stamp.exists(st => st.startsWith("graph=") &&
      st.contains("cells=")), stamp.toString)
    val vdir = new java.io.File(Staged.path(work, "knn_graph_bkt"))
    val parts = vdir.getCanonicalFile.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("nb="))
    assert(parts.nonEmpty, s"expected nb= partition dirs in $vdir")
  }
}
