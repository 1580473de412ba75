package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q177 — the token-stream packing index. Pins the two-level prefix
  * sum against the naive global window it decomposes (on the real
  * sf0.001 table, which spans multiple [[Text.PackBlockDocs]] blocks),
  * and the stream-index invariants a sample loader relies on.
  */
class TokenPackSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("two-level prefix sum equals the naive global running sum") {
    val got = Text.q177TokenStreamPack(spark, sfDir)
      .select($"doc_id", $"global_start")
      .as[(Long, Long)].collect().toMap
    val naive = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(Text.words(col("text"))).cast("long").as("n"))
      .withColumn("gs",
        coalesce(sum(col("n")).over(
          Window.orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"gs").as[(Long, Long)].collect().toMap
    assert(got.size > Text.PackBlockDocs,
      "fixture must span multiple blocks or the decomposition is untested")
    assert(got === naive)
  }

  test("stream index invariants: dense concatenation, in-bin offsets") {
    val rows = Text.q177TokenStreamPack(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    // first doc starts the stream
    assert(rows.head._3 === 0L)
    // each doc starts exactly where its predecessor ended — zero
    // padding is packing's whole point
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 === a._3 + a._2, s"gap between ${a._1} and ${b._1}")
    }
    // bin arithmetic is consistent with the global offset
    rows.foreach { r =>
      assert(r._4 === r._3 / Text.PackBinTokens)
      assert(r._5 === r._3 % Text.PackBinTokens)
    }
    // the corpus genuinely crosses bins (otherwise the law is untested)
    assert(rows.map(_._4).distinct.length > 1)
  }
}
