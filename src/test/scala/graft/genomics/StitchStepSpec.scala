package graft.genomics

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** One unit test per branch of the merge case analysis
  * (/root/reference/assembly_final.cpp:459-598; SURVEY.md §2.3 A6).
  * Each drives [[Assembly.stitchStep]] directly on literal spans.
  */
class StitchStepSpec extends SparkSpec {

  private def step(
      acc: (Int, Int, String), n: (Int, Int, String)): (Int, Int, String) = {
    import spark.implicits._
    val df = Seq((acc, n)).toDF("a", "b")
      .select(Assembly.stitchStep(
        struct($"a._1".as("offset"), $"a._2".as("length"), $"a._3".as("content")),
        struct($"b._1".as("offset"), $"b._2".as("length"), $"b._3".as("content"))
      ).as("r"))
      .select($"r.offset", $"r.length", $"r.content")
    val Row(o: Int, l: Int, c: String) = df.head()
    (o, l, c)
  }

  test("A1 disjoint-left: child ++ N-gap ++ cur (assembly_final.cpp:473-487)") {
    assert(step((10, 5, "AAAAA"), (0, 4, "CCCC")) === ((0, 15, "CCCC" + "N" * 6 + "AAAAA")))
  }

  test("A2 covers-past-end: full replace (assembly_final.cpp:489-501)") {
    assert(step((10, 5, "AAAAA"), (0, 20, "C" * 20)) === ((0, 20, "C" * 20)))
  }

  test("A3 left-overlap: prepend first length_n-1 chars, as-spec'd quirk (assembly_final.cpp:503-517)") {
    assert(step((10, 5, "AAAAA"), (8, 4, "CCGT")) === ((8, 8, "CCG" + "AAAAA")))
  }

  test("B contained: no-op (assembly_final.cpp:520-555 else)") {
    assert(step((10, 5, "AAAAA"), (11, 2, "CC")) === ((10, 5, "AAAAA")))
  }

  test("B right-overlap: append past cur end (assembly_final.cpp:531-555)") {
    // C++ start = 10+5-12 = 3, len = 6+12-10-5 = 3 → "CCC" of "GGGCCC"... use distinct chars
    assert(step((10, 5, "AAAAA"), (12, 6, "XYZCDE")) === ((10, 8, "AAAAA" + "CDE")))
  }

  test("C adjacent at inclusive end: trim 1 base (assembly_final.cpp:558-569)") {
    assert(step((10, 5, "AAAAA"), (14, 3, "CGT")) === ((10, 7, "AAAAA" + "GT")))
  }

  test("D disjoint-right: cur ++ N-gap ++ child (assembly_final.cpp:571-595)") {
    assert(step((10, 5, "AAAAA"), (18, 3, "CCC")) === ((10, 11, "AAAAA" + "NNN" + "CCC")))
  }

  test("D zero gap (exclusive-end adjacency): plain concat") {
    assert(step((10, 5, "AAAAA"), (15, 3, "CCC")) === ((10, 8, "AAAAACCC")))
  }
}
