package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q115's boilerplate guard: a shingle present in more than
  * [[Dedup.SourceDfCap]] sources is chrome, not shared content — it
  * must be counted once in `ubiquitous_shingles` and excluded from
  * every intersection and size, while genuine cross-source overlap
  * (df ≤ cap) still measures. The planted corpus has 12 sources (>
  * cap = 10) all carrying one universal shingle, plus one genuine
  * shared shingle between exactly two sources.
  */
class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-srcoverlap").toString
    val universal = (0 until 12).map { i =>
      (100L + i, "lorem ipsum dolor", "en", f"s$i%02d")
    }
    val genuine = Seq(
      (200L, "alpha beta gamma", "en", "s00"),
      (201L, "alpha beta gamma", "en", "s01"))
    (universal ++ genuine)
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("universal shingle is counted once and excluded from the measure") {
    val rows = Dedup.q115SourceOverlap(spark, dir).collect()
    // the only surviving intersection is the genuine (s00, s01) pair —
    // the universal shingle would otherwise mint all C(12,2) = 66 pairs
    assert(rows.length === 1, rows.mkString("; "))
    val r = rows.head
    assert(r.getAs[String]("src_a") === "s00")
    assert(r.getAs[String]("src_b") === "s01")
    assert(r.getAs[Long]("n_shared") === 1L)
    // sizes exclude the boilerplate shingle: each side holds only its
    // genuine shingle, so the pair's Jaccard is exactly 1
    assert(r.getAs[Long]("n_a") === 1L)
    assert(r.getAs[Long]("n_b") === 1L)
    assert(r.getAs[Double]("jaccard") === 1.0)
    assert(r.getAs[Long]("ubiquitous_shingles") === 1L)
  }

  test("shingles at the cap boundary still measure (df == cap is kept)") {
    val d = java.nio.file.Files.createTempDirectory("graft-srcocap").toString
    // exactly cap sources share the shingle: kept, C(cap,2) pairs
    (0 until Dedup.SourceDfCap).map { i =>
      (300L + i, "delta epsilon zeta", "en", f"t$i%02d")
    }.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = Dedup.q115SourceOverlap(spark, d).collect()
    val cap = Dedup.SourceDfCap
    assert(rows.length === cap * (cap - 1) / 2, rows.length.toString)
    assert(rows.forall(_.getAs[Long]("ubiquitous_shingles") == 0L))
  }
}
