package graft

import org.apache.spark.sql.functions._

/** Diagnostic main behind SCALING.md's recall tables: prints the q126
  * recall@k report (every staged ANN route, including the volume-
  * matched hier descent and the q136 hier+PQ+re-rank composition) and
  * the q130 shortlist-width sweep — recall@1/@5 of the staged IVF-PQ
  * exact re-rank at widths 20/50/100 against the brute-force truth
  * q126 stages. Not part of the driver catalog; run as
  * `sbt 'runMain graft.RecallSweep [sfDir]'`.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = ScaleProbe.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    println("=== q126 recall report ===")
    ops.Similarity.q126RecallReport(spark, dir).collect().foreach { r =>
      println(f"${r.getString(0)}%-22s n=${r.getLong(1)}%2d " +
        f"r@1=${r.getDouble(2)}%.2f r@5=${r.getDouble(3)}%.2f")
    }

    // q126 staged the 20-query brute-force truth; score each width
    // against it (same pair-keyed join as the report)
    val work = ops.Dedup.stageRoot(dir)
    val truth = spark.read.parquet(graft.ops.Staged.path(work, "recall/truth"))
    val tRows = truth.count().toDouble
    val nq = truth.select($"query_id").distinct().count().toDouble
    println("=== q130 shortlist-width sweep (staged IVF-PQ re-rank) ===")
    Seq(20, 50, 100).foreach { w =>
      val res = ops.Similarity.ivfPqRerankStaged(spark, dir, w)
        .select($"query_id", $"rank".as("r_rank"), $"neighbor_id")
        .localCheckpoint()
      val m = truth.as("t").join(res.as("r"),
          $"t.query_id" === $"r.query_id" &&
            $"t.neighbor_id" === $"r.neighbor_id")
        .select($"t.rank".as("t_rank"), $"r.r_rank")
      val hits5 = m.count().toDouble
      val hits1 = m.where($"t_rank" === 1 && $"r_rank" === 1).count().toDouble
      println(f"shortlist=$w%-3d r@1=${hits1 / nq}%.2f r@5=${hits5 / tRows}%.2f")
    }
    spark.stop()
  }
}
