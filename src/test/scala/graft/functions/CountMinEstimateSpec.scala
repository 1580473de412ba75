package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** cms_estimate: the codegen'd count-min point query feeding q83's
  * envelope oracle. Pins the three properties the envelope rests on:
  * overestimate-only (deterministic, not probabilistic), partition
  * invariance of the sketch build (elementwise-sum merge), and the
  * probe staying inside whole-stage codegen.
  */
class CountMinEstimateSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: token_i appears i times, i in 1..60
  private lazy val corpus =
    (1 to 60).flatMap(i => Seq.fill(i)(s"token$i")).toDF("token")

  private def sketchBytes(parts: Int): Array[Byte] =
    corpus.repartition(parts)
      .agg(expr("count_min_sketch(token, 0.01d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)

  test("estimates never undercount any token (CMS overestimate-only)") {
    val bytes = sketchBytes(4)
    val bad = corpus.groupBy($"token").agg(count(lit(1)).as("exact"))
      .select($"token", $"exact",
        call_function("cms_estimate", $"token", lit(bytes)).as("est"))
      .where($"est" < $"exact")
    assert(bad.count() === 0, bad.collect().mkString(", "))
  }

  test("sketch build is partition-invariant (elementwise-sum merge)") {
    val one = sketchBytes(1)
    val seven = sketchBytes(7)
    assert(java.util.Arrays.equals(one, seven),
      "merge order must not change the counter array")
  }

  test("probe is null-safe and stays inside whole-stage codegen") {
    val bytes = sketchBytes(2)
    val nulls = Seq(Option.empty[String]).toDF("token")
      .select(call_function("cms_estimate", $"token", lit(bytes)).as("est"))
    assert(nulls.head().isNullAt(0))
    // range (not a local Seq): ConvertToLocalRelation would fold the
    // probe into a LocalTableScan and hide the codegen evidence
    val planned = spark.range(1, 61)
      .select(concat(lit("token"), $"id").as("token"))
      .select(call_function("cms_estimate", $"token", lit(bytes)).as("est"))
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("cms_estimate")), plan)
    assert(planned.agg(max($"est")).head().getLong(0) >= 60L)
  }

  test("cms_estimate rejects a non-constant sketch argument") {
    val e = intercept[Exception] {
      Seq(("a", Array[Byte](1, 2))).toDF("token", "s")
        .select(call_function("cms_estimate", $"token", $"s"))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable")
      || e.getMessage.toLowerCase.contains("constant"), e.getMessage)
  }

  test("q83 envelope holds end-to-end on sf0.001") {
    val out = graft.ops.Text.q83HeavyHitters(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 20)
    assert(out.forall(_.getBoolean(2)),
      out.filterNot(_.getBoolean(2)).mkString(", "))
  }
}
