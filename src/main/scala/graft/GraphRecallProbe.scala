package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Dedup, Similarity, Staged}

/** Recall-vs-descent-rounds convergence for the staged k-NN graph:
  * how much does EACH NN-descent round buy over the bridged base, and
  * where does it saturate? (The staged `knn_graph` ships ONE round —
  * this probe is the evidence for that knee.) Ladder: the in-cell
  * base alone, the bridged edge set re-ranked (0 rounds), then 1–3
  * descent rounds; each rung's <20-query edge lists scored against
  * the exact brute-force truth, q126's methodology on the graph
  * family's own knob.
  */
object GraphRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = ScaleProbe.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val work = Dedup.stageRoot(dir)
    Similarity.stageCells(spark, dir, work)
    val iv = Similarity.scaledVectors(spark, dir)
      .join(spark.read.parquet(Staged.path(work, "cells")), "vec_id")
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
      .localCheckpoint()
    val q = iv.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val truth = broadcast(q)
      .join(iv.where(col("nrm") > 0), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(Similarity.idot(col("qv"), col("v")),
          col("qn"), col("nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .localCheckpoint()
    val nq = truth.select(col("query_id")).distinct().count()
    def recall(res: DataFrame): (Double, Double) = {
      val m = truth.as("t").join(res.where(col("query_id") < 20).as("r"),
          col("t.query_id") === col("r.query_id") &&
            col("t.neighbor_id") === col("r.neighbor_id"))
        .select(col("t.rank").as("t_rank"), col("r.rank").as("r_rank"))
        .localCheckpoint()
      val h1 = m.where(col("t_rank") === 1 && col("r_rank") === 1).count()
      (h1.toDouble / nq, m.count().toDouble / (5.0 * nq))
    }
    def rescoreTopK(edges: DataFrame): DataFrame = {
      val vx = iv.select(col("vec_id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qn"))
      val vy = iv.select(col("vec_id").as("neighbor_id"), col("v"),
        col("nrm"))
      edges.distinct().join(vx, "query_id").join(vy, "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          Similarity.cosine(Similarity.idot(col("qv"), col("v")),
            col("qn"), col("nrm")).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= Similarity.GraphDegree)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
    }
    val (members, repv) = Similarity.dupCollapsed(iv)
    val cents = Similarity.cellCentroids(iv).localCheckpoint()
    val base = Similarity
      .knnGraphOfCollapsed(members, repv, Similarity.GraphDegree)
      .localCheckpoint()
    val bridged = base.select(col("query_id"), col("neighbor_id"))
      .union(Similarity.bridgeEdgesOf(members, repv,
        Similarity.cellAdjacencyOf(cents)))
      .localCheckpoint()
    val rows = scala.collection.mutable.ArrayBuffer[String]()
    val (b1, b5) = recall(base.select(col("query_id"), col("rank"),
      col("neighbor_id")))
    rows += f"""{"rung":"in_cell_base","r1":$b1%.2f,"r5":$b5%.2f}"""
    val (z1, z5) = recall(rescoreTopK(bridged))
    rows += f"""{"rung":"bridged_0_rounds","r1":$z1%.2f,"r5":$z5%.2f}"""
    var ed = bridged
    for (n <- 1 to 3) {
      val g = Similarity.knnDescentOf(iv, ed, Similarity.GraphDegree)
        .localCheckpoint()
      ed = g.select(col("query_id"), col("neighbor_id"))
      val (r1, r5) = recall(
        g.select(col("query_id"), col("rank"), col("neighbor_id")))
      rows += f"""{"rung":"descent_$n%d_rounds","r1":$r1%.2f,"r5":$r5%.2f}"""
    }
    println(s"""{"metric":"graph_recall_rounds","sf":"$dir",""" +
      s""""rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
