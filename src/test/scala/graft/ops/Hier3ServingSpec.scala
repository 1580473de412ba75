package graft.ops

import graft.SparkSpec

/** q152 — tombstone-masked serving over the FORCED three-level index.
  * The claim this suite pins is the one the oracle row certifies at
  * sf0.01: the serving mask does not know the quantizer's depth — and
  * the staged index under it here is GENUINELY hierarchical, not a
  * flat index renamed.
  */
class Hier3ServingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val work = Dedup.stageRoot(dir)

  private def mtime(name: String): Long =
    new java.io.File(s"$work/$name/_SUCCESS").lastModified()

  test("q152 serves from a demonstrably hierarchical cell space and masks every tombstone") {
    val got = Similarity.q152TombstoneHier3(spark, dir)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.forall { case (q, _, n) => q % 7 != 3 && n % 7 != 3 },
      "a tombstoned id was served or queried")
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted === (1 to rs.size).toList,
        s"ranks not dense after the mask for query $q")
    }
    // the staged assignment is the three-level product space:
    // cell = cell2·k3 + sub with MORE THAN ONE live parent at each
    // level — a flat index renamed would collapse to one
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val (k1, k2, k3) = Similarity.hier3Sizing(n)
    val cells = spark.read.parquet(s"$work/cells_hier3")
      .select("cell").as[Long].collect().toSeq
    assert(cells.max < k1.toLong * k2 * k3)
    assert(cells.map(_ / k3).distinct.size > 1,
      "only one level-2 parent is occupied")
    assert(cells.map(_ / (k2.toLong * k3)).distinct.size > 1 || k1 == 1,
      "only one level-1 super is occupied")
    assert(cells.distinct.size > k3,
      s"cell space no wider than one parent's $k3 leaves")
  }

  test("q152 never re-stages a warm three-level index") {
    Similarity.q152TombstoneHier3(spark, dir).collect() // warm
    val (mc, mp, md) = (mtime("cells_hier3"), mtime("probes_hier3"),
      mtime("deletes"))
    Similarity.q152TombstoneHier3(spark, dir).collect()
    assert(mtime("cells_hier3") === mc && mtime("probes_hier3") === mp
      && mtime("deletes") === md, "q152 re-staged a warm index")
  }
}
