package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q86: the split must be leakage-proof by construction — assignment a
  * pure function of the near-dup cluster representative — and the spec
  * pins it at the strongest level available: against the STAGED PAIRS
  * themselves (every near-dup pair the engine found must land in one
  * split), not just the derived clusters.
  */
class LeakfreeSplitSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val out: Seq[(Long, Long, String)] =
    Dedup.q86LeakfreeSplit(spark, dir)
      .as[(Long, Long, String)].collect().toSeq

  test("every document is assigned exactly once") {
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.size.toLong === nDocs)
    assert(out.map(_._1).distinct.size.toLong === nDocs)
  }

  test("no engine-found near-dup pair straddles splits") {
    val split = out.map(r => r._1 -> r._3).toMap
    val pairs = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/pairs")
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "sf0.001 should contain near-dup pairs")
    val straddling = pairs.filter { case (a, b) => split(a) != split(b) }
    assert(straddling.isEmpty, straddling.mkString(", "))
  }

  test("split is a pure function of the representative") {
    out.groupBy(_._2).foreach { case (rep, rows) =>
      assert(rows.map(_._3).distinct.size === 1, s"rep $rep straddles")
    }
  }

  test("representative-level proportions track 80/10/10") {
    val reps = out.map(r => (r._2, r._3)).distinct
    val train = reps.count(_._2 == "train").toDouble / reps.size
    assert(train > 0.65 && train < 0.95, s"train share $train")
    assert(reps.map(_._2).distinct.toSet === Set("train", "val", "test"))
  }
}
