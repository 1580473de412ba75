package graft

import org.apache.spark.sql.functions._

/** Sharded × THREE-level probe at replica scale — the measured
  * evidence for the 10¹⁰ = shards × hier3 capacity composition at
  * FULL per-shard depth (round-12 verdict, missing #4): q169's oracle
  * row forces 2 levels per shard (enough vectors per leaf at sf0.01);
  * this main replicates the sf0.1 embeddings `factor`× (ids offset,
  * copy 0 verbatim — Hier3Probe's replication), trains a FORCED
  * three-level tree inside every hash shard
  * ([[ops.Similarity.trainShardedHier3]]), descends all shards with
  * the three-stage beam ([[ops.Similarity.shardHier3Probes]]) at the
  * per-shard volume-matched width, and times the scatter-gather
  * search twice (run 2 = warm). Alongside the timings it prints the
  * structural evidence SCALING.md records: occupied leaves per shard,
  * branching at each level, and the candidate volume — which must
  * track width·shards·CellTarget, independent of n.
  *
  * Run: `sbt 'runMain graft.ShardedHier3Probe [factor]'` (default 70).
  */
object ShardedHier3Probe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(70)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ScaleProbe.session(cpus)
    import spark.implicits._

    val dir = s"${sys.props("java.io.tmpdir")}/graft_scaleprobe/e$factor"
    val dst = s"$dir/embeddings.parquet"
    if (!new java.io.File(dst).exists()) {
      spark.read.parquet(s"$src/embeddings.parquet")
        .withColumn("_k", explode(sequence(lit(0), lit(factor - 1))))
        .withColumn("vec_id", $"vec_id" + $"_k" * 10000000L)
        .drop("_k")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(dst)
    }

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[shardhier3] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val shards = ops.Similarity.NumShards
    val n = spark.read.parquet(dst).count()
    val perShard = (n + shards - 1) / shards
    val want = (perShard + ops.Similarity.CellTarget - 1) /
      ops.Similarity.CellTarget
    // forced cube sizing: the smallest k with k^3 >= want per shard —
    // genuine branching at all three levels, leaves still populated
    val k = Iterator.from(2).find(k => k.toLong * k * k >= want).get
    println(s"[shardhier3] n=$n perShard=$perShard want=$want cells/shard " +
      s"-> forced ($k,$k,$k) = ${k * k * k} leaves/shard x $shards shards")

    val (c1, c2, c3, asg0) = timed(s"trainShardedHier3($shards,$k,$k,$k)") {
      val t = ops.Similarity.trainShardedHier3(spark, dir, shards, k, k, k)
      (t._1.localCheckpoint(), t._2.localCheckpoint(),
        t._3.localCheckpoint(), t._4.localCheckpoint())
    }

    // structural evidence: occupied leaves + branching per level
    val leafMod = k.toLong * k * k
    val occ = asg0.groupBy(expr(s"cell div $leafMod").as("shard"))
      .agg(countDistinct($"cell").as("leaves"),
        countDistinct(expr(s"(cell div ${k * k}) % $k")).as("sups"),
        countDistinct(expr(s"(cell div $k) % $k")).as("mids"))
      .orderBy($"shard")
      .as[(Long, Long, Long, Long)].collect()
    occ.foreach { case (sh, lv, sp, md) =>
      println(s"[shardhier3] shard $sh: $lv occupied leaves, " +
        s"$sp/$k supers, $md/$k mids in use")
    }

    val iv = ops.Similarity.scaledVectors(spark, dir)
      .join(asg0, "vec_id")
      .select($"vec_id", $"cell".as("cluster"), $"v", $"nrm")
      .localCheckpoint()
    val queries = iv.where($"vec_id" < 20)
      .select($"vec_id", $"v", $"nrm").localCheckpoint()
    val width = ops.Similarity.volumeMatchedWidth(leafMod, perShard, 2)
    println(s"[shardhier3] per-shard volume-matched width = $width")

    (1 to 2).foreach { run =>
      timed(s"descend+gather run$run (width=$width x $shards shards)") {
        val probes = ops.Similarity.shardHier3Probes(
          queries, c1, c2, c3, k, k, k, width)
        val res = ops.Similarity.searchCells(
          probes.withColumnRenamed("cell", "cluster")
            .join(queries.withColumnRenamed("vec_id", "query_id"),
              "query_id")
            .select($"query_id", $"cluster", $"v".as("qv"),
              $"nrm".as("qn")),
          iv, topK = 5)
        println(s"[shardhier3] run$run rows=${res.count()}")
      }
    }
    // candidate volume: rows flowing into the top-k window — the
    // width·shards·CellTarget bound the composition claims
    val probes = ops.Similarity.shardHier3Probes(
      queries, c1, c2, c3, k, k, k, width)
    val cand = probes.join(iv, probes("cell") === iv("cluster")).count()
    println(s"[shardhier3] candidate volume = $cand " +
      s"(bound ~ 20 queries x $width x $shards x cell-occupancy)")
    spark.stop()
  }
}
