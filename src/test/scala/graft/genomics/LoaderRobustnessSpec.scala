package graft.genomics

import graft.SparkSpec

/** Malformed input lines must be skipped, not crash the scan (the
  * reference's parser bails out on `strm.fail()`,
  * assembly_final.cpp:119-120; we skip the whole line — documented
  * deviation: the reference would keep a half-parsed record).
  */
class LoaderRobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("loader skips malformed / short / comment lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-garbage")
    val f = dir.resolve("garbage.txt")
    java.nio.file.Files.writeString(f,
      "not a valid line\n\n# some comment junk here\n" +
      "7 3 ACG 5 0.5\n" +
      "8 3 nine CGT 0.5 oops\n" + // 6 tokens but non-numeric where numbers go
      "9 4 ACGT 12 0.75 7\n")
    val (v, e) = Reads.loadGraphTsv(spark, f.toString)
    assert(v.as[Read].collect().toSet ===
      Set(Read(7L, 3, "ACG", 5, 0.5), Read(9L, 4, "ACGT", 12, 0.75)))
    assert(e.as[(Long, Long)].collect().toSet === Set((9L, 7L)))
  }

  test("S4 edge sink round-trips through its text format") {
    val edges = Seq((33L, 10L), (10L, 38L), (7L, 9L)).toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("graft-edges").toString
    Reads.edgeProjection(edges).write.mode("overwrite").text(dir)
    val back = Reads.parseEdgeLines(spark, dir)
    assert(back.as[(Long, Long)].collect().toSet ===
      Set((33L, 10L), (10L, 38L), (7L, 9L)))
  }
}
