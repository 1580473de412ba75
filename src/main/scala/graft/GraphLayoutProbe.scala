package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** The round-15 watch item, measured: each walk round hash-joins a
  * model-sized frontier against the FULL staged graph table — Spark
  * has no point lookups, so a query batch pays rounds× corpus-shaped
  * scans. The storage-side knob is a node-clustered layout (q162's
  * discipline): write the symmetrized substrate PARTITIONED by a
  * coarse node bucket (`nb = pmod(node, 64)`), collect the frontier's
  * touched buckets per round (the frontier is model-sized and already
  * driver-checkpointed — the collect is free), and read ONLY those
  * partition directories. Results are provably identical — every
  * frontier node's rows live in its bucket; pruning skips buckets no
  * frontier node hashes to.
  *
  * The economics this probe quantifies: with a RANDOM bucket key
  * (`pmod(node, 64)`), expected touched buckets =
  * 64·(1 − (1 − 1/64)^|frontier|) — pruning wins only when the
  * per-round frontier is small (the online-serving shape) and
  * degenerates to a full scan at the bench's 20-query batch (~320
  * frontier nodes → ~63.6 of 64 buckets; measured 164/256 r16).
  * CELL-ALIGNED keying (`pmod(cell(node), 64)`, round 17 — the
  * shipped q197 layout) exploits what the random key wastes: a walk
  * frontier is geometrically local, so its nodes concentrate in few
  * cells and the touched fraction collapses toward the probed-cell
  * fraction (the DiskANN layout premise). Each edge row carries its
  * target's bucket (`neighbor_nb`), so the cell walk elects buckets
  * from an accumulated model-sized (node, nb) map — no corpus
  * lookup. All three layouts are measured (buckets touched + the
  * ROW fraction those buckets hold — the honest read-bytes metric,
  * since cell buckets are not equal-sized), REPEAT per run, at the
  * given replica factor; visited sets asserted identical.
  */
object GraphLayoutProbe {
  private val Buckets = 64

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(1)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ScaleProbe.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = if (factor <= 1) src
      else ScaleProbe.ensureReplica(spark, src, factor, None, 32)
    val work = Dedup.stageRoot(dir)
    Similarity.q188KnnDescent(spark, dir).count() // ensure staged
    val (snap, gsnap) = Similarity.resolveWalkSnapshots(spark, dir, work)

    // materialize the SAME symmetrized substrate in both layouts
    val g0 = spark.read.parquet(gsnap("knn_graph"))
    val fwd = g0.select(col("query_id").as("node"), col("neighbor_id"))
    val rev = g0.withColumn("r", row_number().over(
        Window.partitionBy(col("neighbor_id")).orderBy(col("query_id"))))
      .where(col("r") <= Similarity.DescentReverseCap)
      .select(col("neighbor_id").as("node"),
        col("query_id").as("neighbor_id"))
    val substrate = fwd.union(rev).distinct().localCheckpoint()
    // cache keyed by the resolved graph VERSION, not just the factor —
    // a restaged graph (new testdata, new recipe) must not silently
    // re-measure stale layouts
    val gv = new java.io.File(gsnap("knn_graph")).getName
    val base = s"${sys.props("java.io.tmpdir")}/" +
      s"graft_graph_layout_x${factor}_$gv"
    val flatPath = s"$base/flat"
    val bktPath = s"$base/bkt"
    val cellPath = s"$base/cell"
    val nCells = spark.read.parquet(gsnap("knn_medoids")).count()
    val nbOf = spark.read.parquet(snap("cells"))
      .select(col("vec_id"),
        Similarity.walkBucketExpr(col("cluster"), col("vec_id"), nCells)
          .as("nb"))
    if (!new java.io.File(flatPath).exists())
      substrate.write.mode("overwrite").parquet(flatPath)
    if (!new java.io.File(bktPath).exists())
      substrate.withColumn("nb", pmod(col("node"), lit(Buckets)))
        .repartition(col("nb"))
        .write.mode("overwrite").partitionBy("nb").parquet(bktPath)
    if (!new java.io.File(cellPath).exists())
      substrate
        .join(nbOf.withColumnRenamed("vec_id", "node"), "node")
        .join(nbOf.select(col("vec_id").as("neighbor_id"),
          col("nb").as("neighbor_nb")), "neighbor_id")
        .select(col("node"), col("neighbor_id"), col("neighbor_nb"),
          col("nb"))
        .repartition(col("nb"))
        .write.mode("overwrite").partitionBy("nb").parquet(cellPath)

    // per-bucket row occupancy per layout — model-sized (≤64 rows),
    // turns touched-bucket lists into the honest rows-read fraction
    def occupancy(path: String): Map[Long, Long] =
      spark.read.parquet(path).groupBy(col("nb").cast("long").as("nb"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val occRand = occupancy(bktPath)
    val occCell = occupancy(cellPath)
    val totalRows = substrate.count()

    val iv = Similarity.scaledVectors(spark, dir)
      .join(spark.read.parquet(snap("cells")), "vec_id")
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
    val medoids = spark.read.parquet(gsnap("knn_medoids"))
    val probesAll = spark.read.parquet(snap("probes"))

    // the walk loop, reading the graph per round — layout "rand"
    // prunes pmod(node) buckets, "cell" prunes cell-aligned buckets
    // via the known-(node,nb) map, "flat" reads everything
    def walk(nQueries: Int, layout: String): (Double, Long, Long, Long) = {
      val queries = iv.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val probes = probesAll.where(col("query_id") < nQueries)
      val vy = iv.select(col("vec_id").as("neighbor_id"), col("v"),
        col("nrm"))
      def score(cand: DataFrame): DataFrame =
        cand.join(queries, "query_id").join(vy, "neighbor_id")
          .select(col("query_id"), col("neighbor_id"),
            Similarity.cosine(Similarity.idot(col("qv"), col("v")),
              col("qn"), col("nrm")).as("cosine"))
      val t0 = System.nanoTime()
      var visited = score(
        probes.join(medoids, "cluster")
          .select(col("query_id"), col("medoid").as("neighbor_id"))
          .where(col("neighbor_id") =!= col("query_id"))
          .distinct()).localCheckpoint()
      var expanded = visited
        .select(col("query_id"), col("neighbor_id").as("node"))
        .where(lit(false)).localCheckpoint()
      var known =
        if (layout == "cell")
          medoids.select(col("medoid").as("node"),
            Similarity.walkBucketExpr(col("cluster"), col("medoid"),
              nCells).as("nb"))
            .distinct().localCheckpoint()
        else null
      val wb = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      var bucketsTouched = 0L
      var rowsRead = 0L
      for (_ <- 1 to Similarity.WalkRounds) {
        val frontier = visited
          .join(expanded.withColumnRenamed("node", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_anti")
          .withColumn("r", row_number().over(wb))
          .where(col("r") <= Similarity.WalkBeam)
          .select(col("query_id"), col("neighbor_id").as("node"))
          .localCheckpoint()
        expanded = expanded.union(frontier).localCheckpoint()
        val graph = layout match {
          case "rand" =>
            // model-sized driver collect: the frontier is already a
            // checkpointed ≤ queries×beam frame
            val bks = frontier
              .select(pmod(col("node"), lit(Buckets)).as("nb"))
              .distinct().collect().map(_.getLong(0)).toIndexedSeq
            bucketsTouched += bks.length
            rowsRead += bks.map(occRand.getOrElse(_, 0L)).sum
            spark.read.parquet(bktPath)
              .where(col("nb").isin(bks: _*))
              .select(col("node"), col("neighbor_id"))
          case "cell" =>
            val bks = frontier.join(known, "node")
              .select(col("nb")).distinct().collect()
              .map(_.getLong(0)).toIndexedSeq
            bucketsTouched += bks.length
            rowsRead += bks.map(occCell.getOrElse(_, 0L)).sum
            val fEdges = spark.read.parquet(cellPath)
              .where(col("nb").isin(bks: _*))
              .join(broadcast(frontier.select(col("node")).distinct()),
                "node")
              .select(col("node"), col("neighbor_id"),
                col("neighbor_nb"))
              .localCheckpoint()
            known = known.union(fEdges
                .select(col("neighbor_id").as("node"),
                  col("neighbor_nb").as("nb")))
              .distinct().localCheckpoint()
            fEdges.select(col("node"), col("neighbor_id"))
          case _ =>
            rowsRead += totalRows
            spark.read.parquet(flatPath)
        }
        val fresh = frontier.join(graph, "node")
          .where(col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"))
          .distinct()
          .join(visited.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id"), "left_anti")
        visited = visited.union(score(fresh)).localCheckpoint()
      }
      val n = visited.count()
      ((System.nanoTime() - t0) / 1e9, n, bucketsTouched, rowsRead)
    }

    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(2)
    val shapes = Seq(2, 20)
    val layouts = Seq("flat", "rand", "cell")
    val results = for {
      nq <- shapes
      layout <- layouts
    } yield {
      val runs = (1 to repeat).map { i =>
        val (sec, rows, bks, rr) = walk(nq, layout)
        val frac = rr.toDouble / (totalRows * Similarity.WalkRounds)
        println(f"LAYOUT q=$nq%2d layout=$layout%-4s run$i $sec%7.2f s " +
          f"visited=$rows buckets=$bks rows_read=$rr (${frac * 100}%.1f%%)")
        (sec, rows, bks, rr)
      }
      val rowsets = runs.map(_._2).distinct
      assert(rowsets.size == 1, s"non-deterministic visited: $rowsets")
      (nq, layout, runs.map(_._1).min, runs.head._2, runs.head._3,
        runs.head._4)
    }
    // identical visited counts across layouts at each query shape —
    // pruning must be invisible to results
    shapes.foreach { nq =>
      val vs = results.filter(_._1 == nq).map(_._4).distinct
      assert(vs.size == 1, s"layouts disagree at q=$nq: $vs")
    }
    val qs = results.map { case (nq, layout, sec, _, bks, rr) =>
      s""""q${nq}_$layout":{"sec":$sec,"buckets":$bks,"rows_read":$rr}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"graph_layout_probe","factor":$factor,""" +
      s""""buckets":$Buckets,"total_rows":$totalRows,"shapes":$qs}""")
    spark.stop()
  }
}
