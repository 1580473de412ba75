package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, Staged}

/** Budget sweep for the PQ-PRICED walk (q194's knobs) — the
  * [[WalkBudgetProbe]] methodology re-run under compressed pricing:
  * the exact walk's measured frontier point was (4, 16), but an
  * ADC-guided frontier is NOISY (the 4×16 PQ misleads elections), so
  * the compressed route may buy recall differently — more beam keeps
  * more of the quantizer's near-misses alive for the exact rerank-all
  * tail, at a budget that stays bounded (scored/query is reported per
  * cell). Recall is scored against the same exact-cosine truth.
  */
object WalkPqBudgetProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = ScaleProbe.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val work = Dedup.stageRoot(dir)
    Similarity.q194GraphWalkPqRerank(spark, dir).count() // ensure staged
    val (snap, gsnap) = Similarity.resolveWalkSnapshots(spark, dir, work)
    val pq = Staged.resolveGroup(work, Seq("pq_codes", "pq_codebook"))
    val iv = Similarity.walkVectors(spark, dir, snap).localCheckpoint()
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
    val codes = spark.read.parquet(pq("pq_codes"))
    val queries = iv.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
      .localCheckpoint()
    val lut = Similarity.adcLutFor(
      queries.select(col("query_id").as("vec_id"), col("qv").as("v")),
      spark.read.parquet(pq("pq_codebook"))).localCheckpoint()
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
    val rows = for ((rounds, beam) <- Seq((4, 8), (4, 16), (6, 16),
        (4, 32), (6, 32), (4, 64))) yield {
      val t0 = System.nanoTime()
      val visited = Similarity.graphWalkVisitedAdc(probes, medoids,
          graph, codes, lut, rounds = rounds, beam = beam)
        .localCheckpoint()
      // the shipped rerank-all tail, in-probe: exact cosine over the
      // whole bounded visited set, top-5
      val res = broadcast(visited.select(col("query_id"),
          col("neighbor_id")))
        .join(iv, col("vec_id") === col("neighbor_id"))
        .join(queries, Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.cosine(Similarity.idot(col("qv"), col("v")),
            col("qn"), col("nrm")).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .localCheckpoint()
      val nVisited = visited.count()
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
        f""""scored_per_q":${nVisited / nq},"sec":$dt%.1f}"""
    }
    println(s"""{"metric":"walk_pq_budget","sf":"$dir",""" +
      s""""rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
