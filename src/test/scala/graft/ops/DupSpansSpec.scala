package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q85 exact-substring (duplicate-span) detection on a corpus planted
  * so every boundary is forced:
  *
  *   - A and B share an 8-token run → the four overlapping duplicated
  *     5-grams must MERGE into one maximal span on each side;
  *   - A and C share an exactly-5-token run → a second, disjoint span
  *     in A (so A reports two islands, 13 of 15 tokens duplicated);
  *   - D repeats a 4-gram internally but shares nothing cross-doc →
  *     must NOT be flagged (within-doc repetition is q63's domain);
  *   - E has fewer than 5 tokens → no shingles, absent.
  */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-dupspans").toString
    Seq(
      (1L, "a b c d e f g h x1 x2 q r s t u"),
      (2L, "z1 z2 a b c d e f g h z3"),
      (3L, "q r s t u y1 y2 y3 y4 y5"),
      (4L, "m n o p m n o p m n o p"),
      (5L, "one two three"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val out: Map[Long, (Long, Long, Long, Double)] =
    Dedup.q85DupSpans(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("overlapping duplicated 5-grams merge into one maximal span") {
    // B: shared run occupies positions 3..10 → one span, 8 tokens
    assert(out(2L) === ((11L, 1L, 8L, 8.0 / 11)))
  }

  test("disjoint shared runs yield separate islands with exact boundaries") {
    // A: [1,8] with B plus [11,15] with C → 2 spans, 13 of 15 tokens
    assert(out(1L) === ((15L, 2L, 13L, 13.0 / 15)))
    // C: exactly the 5-token minimum run
    assert(out(3L) === ((10L, 1L, 5L, 5.0 / 10)))
  }

  test("within-doc-only repetition and sub-shingle docs are not flagged") {
    assert(!out.contains(4L), s"D repeats only internally: $out")
    assert(!out.contains(5L), s"E has <5 tokens: $out")
  }

  test("plan marks positions by semi-join — duplicated shingles never multiply rows") {
    val p = Dedup.q85DupSpans(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
