package graft

import org.apache.spark.sql.functions._

/** Above-the-two-level-ceiling scale probe: replicate the sf0.1
  * embeddings until the corpus NATURALLY exceeds the 4096-cell
  * two-level capacity (want = ceil(n/CellTarget) > 4096 ⇒ n > 8.39M
  * vectors), then run the PRODUCTION `stageIvfIndex` route — which
  * must auto-select the three-level quantizer — and score own-cell +
  * volume-matched-descent recall against the exact brute-force truth
  * (q126's scoring methodology). Replicates embeddings ONLY (the ANN
  * family reads nothing else); ids offset per copy like ScaleProbe's
  * replicas. Same caveat as the above-clamp two-level run recorded in
  * SCALING.md: byte-identical replication gives each query exact
  * twins, so this measures ROUTING correctness of the 3-level
  * stage/descend/search machinery at >4096 cells, not a
  * discriminative recall curve (that is the sf0.01 table).
  *
  * `SPARK_GRAFT_EMB_PERTURB=1` switches to SPREAD replication: every
  * non-zero copy's components get a deterministic ±20% multiplicative
  * jitter keyed by (new vec_id, dim) — no RNG — so the corpus holds
  * 8.4M genuinely DISTINCT positions (each base vector fans into a
  * ±20% ball) instead of 2000 distinct positions with 4200
  * byte-exact twins each. Byte-identical mode caps OCCUPIED cells at
  * the distinct-position count (a quantizer cannot split identical
  * points); the spread mode is the occupancy evidence — the trained
  * index must genuinely fill >4096 leaves. Copy 0 stays verbatim, so
  * the 20 query vectors are the original embeddings in both modes.
  *
  * Run: `sbt 'runMain graft.Hier3Probe [factor]'` (default 4200).
  */
object Hier3Probe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(4200)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val perturb = sys.env.get("SPARK_GRAFT_EMB_PERTURB").contains("1")
    val spark = ScaleProbe.session(cpus)
    import spark.implicits._

    val tag = if (perturb) s"e${factor}p" else s"e$factor"
    val dir = s"${sys.props("java.io.tmpdir")}/graft_scaleprobe/$tag"
    val dst = s"$dir/embeddings.parquet"
    if (!new java.io.File(dst).exists()) {
      val base = spark.read.parquet(s"$src/embeddings.parquet")
        .withColumn("_k", explode(sequence(lit(0), lit(factor - 1))))
        .withColumn("vec_id", $"vec_id" + $"_k" * 10000000L)
      val spread =
        if (perturb) base.withColumn("embedding",
          when($"_k" === 0, $"embedding").otherwise(expr(
            """transform(embedding, (x, i) -> CAST(x * (1.0 +
              |(CAST(pmod(xxhash64(vec_id, i), 401) AS DOUBLE) - 200.0)
              |/ 1000.0) AS FLOAT))""".stripMargin)))
        else base
      spread.drop("_k")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(dst)
    }

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[hier3probe] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val n = spark.read.parquet(dst).count()
    val want = (n + ops.Similarity.CellTarget - 1) / ops.Similarity.CellTarget
    println(s"[hier3probe] n=$n want=$want cells " +
      s"(two-level ceiling ${ops.Similarity.Hier2MaxCells})")
    require(want > ops.Similarity.Hier2MaxCells,
      s"factor $factor does not exceed the two-level ceiling")

    val work = ops.Dedup.stageRoot(dir)
    timed("production stageIvfIndex (3-level route)") {
      ops.Similarity.stageIvfIndex(spark, dir, work)
    }
    val cells = spark.read.parquet(graft.ops.Staged.path(work, "cells")).localCheckpoint()
    val nCells = cells.select($"cluster").distinct().count()
    val top = cells.groupBy($"cluster").count()
      .agg(max($"count"), min($"count")).head()
    println(s"[hier3probe] staged cells: $nCells occupied, " +
      s"largest=${top.getLong(0)}, smallest=${top.getLong(1)}")

    // truth: exact top-5 for the 20 staged query ids, one corpus scan
    val iv = ops.Similarity.scaledVectors(spark, dir)
      .where($"nrm" > 0).select($"vec_id", $"v", $"nrm")
      .localCheckpoint()
    val q = iv.where($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    val truth = timed("brute-force truth") {
      broadcast(q).join(iv, $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          ops.Similarity.cosine(
            ops.Similarity.idot($"qv", $"v"), $"qn", $"nrm").as("cosine"))
        .withColumn("rank", row_number().over(w))
        .where($"rank" <= 5)
        .select($"query_id", $"rank", $"neighbor_id")
        .localCheckpoint()
    }

    def score(name: String, res: org.apache.spark.sql.DataFrame): Unit = {
      val r = res.select($"query_id", $"rank".as("r_rank"), $"neighbor_id")
        .localCheckpoint()
      val m = truth.as("t").join(r.as("r"),
          $"t.query_id" === $"r.query_id" &&
            $"t.neighbor_id" === $"r.neighbor_id")
        .select($"t.rank".as("t_rank"), $"r.r_rank")
      val nq = truth.select($"query_id").distinct().count().toDouble
      val tRows = truth.count().toDouble
      val hits5 = m.count().toDouble
      val hits1 =
        m.where($"t_rank" === 1 && $"r_rank" === 1).count().toDouble
      println(f"[hier3probe] $name%-18s r@1=${hits1 / nq}%.2f " +
        f"r@5=${hits5 / tRows}%.2f")
    }

    val civ = iv.join(cells, "vec_id")
      .select($"vec_id", $"cluster", $"v", $"nrm")
    val ownProbes = civ.where($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"cluster",
        $"v".as("qv"), $"nrm".as("qn"))
    score("own_cell", timed("own-cell search") {
      ops.Similarity.searchCells(ownProbes, civ, 5).localCheckpoint()
    })
    val descProbes = spark.read.parquet(graft.ops.Staged.path(work, "probes"))
      .join(iv.withColumnRenamed("vec_id", "query_id"), "query_id")
      .select($"query_id", $"cluster", $"v".as("qv"), $"nrm".as("qn"))
    score("descent_2probe_vm", timed("volume-matched descent search") {
      ops.Similarity.searchCells(descProbes, civ, 5).localCheckpoint()
    })
    spark.stop()
  }
}
