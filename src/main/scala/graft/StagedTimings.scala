package graft

/** Diagnostic main behind SCALING.md's staged-input timing rows: times
  * the self-contained Verify forms of q123/q126 (which re-derive their
  * staged inputs every run) against the staged-input production entries
  * ([[graft.ops.Dedup.dedupAgreementStaged]],
  * [[graft.ops.Similarity.recallReportStaged]]) over the assets the
  * self-contained run just staged. Run as
  * `sbt 'runMain graft.StagedTimings [sfDir]'`.
  */
object StagedTimings {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = ScaleProbe.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val work = ops.Dedup.stageRoot(dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMING $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    time("q123_self_contained") {
      ops.Dedup.q123DedupAgreement(spark, dir).count()
    }
    time("q123_staged_input") {
      ops.Dedup.dedupAgreementStaged(spark, dir, work).count()
    }
    time("q126_self_contained") {
      ops.Similarity.q126RecallReport(spark, dir).count()
    }
    println(s"q126 cold recert re-ran " +
      s"${ops.Similarity.lastRecallRoutesRerun}/11 routes")
    // incremental recertification (round 14): the SAME call with no
    // index motion since — every per-route staging's version stamp
    // still matches, so zero searches re-run
    time("q126_warm_recert") {
      ops.Similarity.q126RecallReport(spark, dir).count()
    }
    println(s"q126 warm recert re-ran " +
      s"${ops.Similarity.lastRecallRoutesRerun}/11 routes")
    time("q126_staged_input") {
      ops.Similarity.recallReportStaged(spark, work).count()
    }
    spark.stop()
  }
}
