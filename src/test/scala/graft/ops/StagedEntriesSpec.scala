package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Production staged-input catalog entries (q138/q139/q140): each must
  * (a) return exactly what its self-contained twin returns — staging
  * is deterministic, so consuming the staged assets is equivalence,
  * not approximation — and (b) NEVER re-stage an asset a query of
  * this run already staged (the whole point of the entries is that
  * the model-sized consume joins are all they pay). Re-staging is
  * detected by the `_SUCCESS` commit marker's mtime.
  */
class StagedEntriesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val work = Dedup.stageRoot(dir)

  private def mtime(name: String): Long =
    new java.io.File(s"$work/$name/_SUCCESS").lastModified()

  test("q138 equals q123 and a warm run never re-stages the pair tables") {
    val self = Dedup.q123DedupAgreement(spark, dir).collect().toSeq
    val (mp, ms) = (mtime("pairs"), mtime("sh_pairs"))
    val staged = Dedup.q138DedupAgreementStaged(spark, dir).collect().toSeq
    assert(staged === self)
    assert(mtime("pairs") === mp && mtime("sh_pairs") === ms,
      "q138 re-staged a warm pair table")
  }

  test("q148 equals q48 and a warm run never re-stages the dedup archive") {
    val self = Dedup.q48IncrementalIngest(spark, dir).collect().toSeq
    val staged0 = Dedup.q148IngestDedupStaged(spark, dir).collect().toSeq
    assert(staged0 === self)
    // second (warm) run: archive untouched
    val (mn, ms, mg) =
      (mtime("corpus_nh"), mtime("corpus_sh"), mtime("corpus_sig"))
    val staged1 = Dedup.q148IngestDedupStaged(spark, dir).collect().toSeq
    assert(staged1 === self)
    assert(mtime("corpus_nh") === mn && mtime("corpus_sh") === ms &&
      mtime("corpus_sig") === mg, "q148 re-staged a warm archive")
  }

  test("q140 equals q99 and a warm run never re-stages the cells") {
    val self = Similarity.q99SemanticDecon(spark, dir).collect().toSeq
    val mc = mtime("cells")
    val staged =
      Similarity.q140SemanticDeconStaged(spark, dir).collect().toSeq
    assert(staged === self)
    assert(mtime("cells") === mc, "q140 re-staged warm cells")
  }

  test("q139 consumes run-staged recall assets without re-staging") {
    // plant model-sized assets directly (q126's real staging is its
    // own oracle-certified query; this pins ONLY the guard + consume)
    // ephemeral publish (durable = false): the planted fakes serve
    // THIS JVM only — no manifest, so a later run of the same build
    // can never cross-run-trust them in place of q126's real staging
    def plant(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val v = Staged.publishDir(work, name)
      df.write.mode("overwrite").parquet(v)
      Staged.commit(work, name, v, durable = false)
    }
    plant(Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 12L))
      .toDF("query_id", "rank", "neighbor_id"), "recall/truth")
    plant(Seq(("m1", 1L, 1, 10L), ("m1", 2L, 1, 99L))
      .toDF("method", "query_id", "rank", "neighbor_id"), "recall/results")
    val (mt, mr) = (mtime("recall/truth"), mtime("recall/results"))
    val got = Similarity.q139RecallReportStaged(spark, dir)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(mtime("recall/truth") === mt &&
      mtime("recall/results") === mr,
      "q139 re-staged warm recall assets")
    // m1 carried truth (q1, rank 1, n10) at result rank 1 → recall@1 =
    // 1 of 2 queries; 1 of 3 truth rows matched → recall@5 = 1/3
    assert(got === Seq(("m1", 2L, 0.5, 1.0 / 3.0)))
  }
}
