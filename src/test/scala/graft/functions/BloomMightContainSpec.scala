package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

class BloomMightContainSpec extends SparkSpec {
  import spark.implicits._

  private def filterBytes(items: Seq[Long], expected: Long = 1024L): Array[Byte] = {
    val bf = BloomFilter.create(expected, 0.01)
    items.foreach(bf.putLong)
    val os = new java.io.ByteArrayOutputStream()
    bf.writeTo(os)
    os.toByteArray
  }

  test("bloom_might_contain has no false negatives and removes most non-members") {
    val members = (0L until 500L).map(_ * 7919L)
    val bytes = filterBytes(members)
    val nonMembers = (0L until 10000L).map(_ * 7919L + 1L)
    val df = (members ++ nonMembers).toDF("h")
      .select($"h", call_function("bloom_might_contain", $"h", lit(bytes)).as("hit"))
    // every member must hit (Bloom filters cannot false-negative)
    assert(df.where($"h" % 7919 === 0 && !$"hit").count() === 0)
    // non-members pass at ~fpp (1%): allow a generous 5% margin
    assert(df.where($"h" % 7919 =!= 0 && $"hit").count() <= 500)
  }

  test("bloom_might_contain is null-safe and stays inside whole-stage codegen") {
    val bytes = filterBytes(Seq(42L))
    val nulls = Seq(Option.empty[Long]).toDF("h")
      .select(call_function("bloom_might_contain", $"h", lit(bytes)).as("hit"))
    assert(nulls.head().isNullAt(0))
    val planned = spark.range(1000)
      .select(call_function("bloom_might_contain", $"id", lit(bytes)).as("hit"))
    // `*(n)` prefixes mark whole-stage-codegen'd operators in the plan dump
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("bloom_might_contain")), plan)
    assert(planned.where($"hit").count() >= 1) // 42 is a member
  }

  test("bloom_might_contain rejects a non-constant filter argument") {
    val e = intercept[Exception] {
      Seq((1L, Array[Byte](1, 2))).toDF("h", "f")
        .select(call_function("bloom_might_contain", $"h", $"f"))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable")
      || e.getMessage.toLowerCase.contains("constant"), e.getMessage)
  }
}
