package graft.ops

import graft.SparkSpec

/** The write-stage-then-consume composition (q37): each dedup stage
  * persisted to parquet must reproduce exactly what the self-contained
  * catalog queries derive from raw text — staging changes the cost
  * model, never the answer.
  */
class StagedDedupSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  test("staged pairs/clusters/survivors from parquet equal the self-contained derivation") {
    val work = java.nio.file.Files.createTempDirectory("graft-staged-spec").toString
    Dedup.stagePairs(spark, dir, work)
    Dedup.stageClusters(spark, work)
    Dedup.stageSurvivors(spark, dir, work)

    val stagedPairs = spark.read.parquet(s"$work/pairs")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val scratchPairs = Dedup.q31MinhashPairs(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(stagedPairs === scratchPairs)

    val stagedClusters = spark.read.parquet(s"$work/clusters")
      .as[(Long, Long)].collect().toSet
    val scratchClusters = Dedup.q35DedupClusters(spark, dir)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(stagedClusters === scratchClusters)

    val stagedSurv = spark.read.parquet(s"$work/survivors")
      .as[Long].collect().toSet
    val scratchSurv = Dedup.q36DedupSurvivors(spark, dir)
      .as[Long].collect().toSet
    assert(stagedSurv === scratchSurv)
  }

  test("q173 star-reduced archive reproduces q37's answer with a smaller staged file") {
    val got = Dedup.q173StagedSurvivorsStar(spark, dir)
      .as[(Long, Long)].collect().toSeq
    val want = Dedup.q37StagedSurvivors(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got === want,
      "the star-reduced pair archive changed the clusters or survivors")
    // volume: pairs_star never exceeds the raw pair archive and is
    // star-shaped (every component's edges share its min-id hub after
    // the global closure — locally it may briefly be a forest of hubs,
    // but it must at minimum undercut C(g,2) on any clustered corpus)
    val work = Dedup.stageRoot(dir)
    val raw = spark.read.parquet(Staged.path(work, "pairs")).count()
    val star = spark.read.parquet(Staged.path(work, "pairs_star")).count()
    assert(star <= raw, s"star archive bigger than raw: $star > $raw")
  }

  test("connectedComponents refuses to return unconverged labels") {
    // diameter 30 ≫ 3 rounds: min-label cannot have converged, and
    // silently returning split clusters would under-delete downstream
    val chain = (0L until 30L).map(i => i -> (i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
