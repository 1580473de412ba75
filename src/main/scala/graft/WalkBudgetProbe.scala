package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Dedup, Similarity, Staged}

/** Recall-vs-budget sweep for the greedy graph walk (q189's knobs):
  * rounds × beam against the exact truth — q137's width-sweep
  * methodology on the walk's own budget. Evidence for the shipped
  * (rounds=4, beam=16) default ([[graft.ops.Similarity.WalkBeam]]):
  * the round-15 sweep moved the default from (4, 8) to the measured
  * frontier point (4, 16) — 0.95/0.81 recall@1/@5 at ~254 exact
  * scores/query, dominating both (4, 8) (0.70/0.62 @161) and (6, 8)
  * (0.80/0.72 @231) — and this table is what justified the move.
  */
object WalkBudgetProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = ScaleProbe.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val work = Dedup.stageRoot(dir)
    Similarity.q188KnnDescent(spark, dir).count() // ensure graph staged
    val snap = Staged.resolveGroup(work, Seq("cells", "probes"))
    val gsnap = Staged.resolveGroup(work,
      Seq("knn_graph", "knn_medoids"))
    val iv = Similarity.scaledVectors(spark, dir)
      .join(spark.read.parquet(snap("cells")), "vec_id")
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
      .localCheckpoint()
    val g0 = spark.read.parquet(gsnap("knn_graph"))
    val fwd = g0.select(col("query_id").as("node"), col("neighbor_id"))
    val rev = g0
      .withColumn("r", row_number().over(
        Window.partitionBy(col("neighbor_id")).orderBy(col("query_id"))))
      .where(col("r") <= Similarity.DescentReverseCap)
      .select(col("neighbor_id").as("node"),
        col("query_id").as("neighbor_id"))
    val graph = fwd.union(rev).distinct().localCheckpoint()
    val medoids = spark.read.parquet(gsnap("knn_medoids"))
    val probes = spark.read.parquet(snap("probes"))
    val queries = iv.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
      .localCheckpoint()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val truth = broadcast(queries)
      .join(iv.where(col("nrm") > 0), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(Similarity.idot(col("qv"), col("v")),
          col("qn"), col("nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .localCheckpoint()
    val nq = truth.select(col("query_id")).distinct().count()
    val rows = for ((rounds, beam) <- Seq((1, 4), (2, 4), (2, 8),
        (4, 8), (6, 8), (4, 16), (4, 32), (4, 64))) yield {
      val t0 = System.nanoTime()
      val res = Similarity.graphWalkOf(queries, probes, medoids, graph,
          iv, rounds = rounds, beam = beam, topK = 5)
        .localCheckpoint()
      val visited = Similarity.graphWalkVisited(queries, probes,
          medoids, graph, iv, rounds = rounds, beam = beam)
        .count()
      val dt = (System.nanoTime() - t0) / 1e9
      val m = truth.as("t").join(res.as("r"),
          col("t.query_id") === col("r.query_id") &&
            col("t.neighbor_id") === col("r.neighbor_id"))
        .select(col("t.rank").as("t_rank"), col("r.rank").as("r_rank"))
        .localCheckpoint()
      val h1 = m.where(col("t_rank") === 1 && col("r_rank") === 1).count()
      val h5 = m.count()
      f"""{"rounds":$rounds,"beam":$beam,"r1":${h1.toDouble / nq}%.2f,""" +
        f""""r5":${h5.toDouble / (5.0 * nq)}%.2f,""" +
        f""""scored_per_q":${visited / nq},"sec":$dt%.1f}"""
    }
    println(s"""{"metric":"walk_budget","sf":"$dir",""" +
      s""""rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
