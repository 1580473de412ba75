package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LongDotProductSpec extends SparkSpec {
  import spark.implicits._

  test("vec_ldot equals the interpreted HOF spelling on random vectors") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Array.fill(64)(rng.nextInt(100000).toLong - 50000),
      Array.fill(64)(rng.nextInt(100000).toLong - 50000)))
    val df = rows.toDF("a", "b").select(
      call_function("vec_ldot", $"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (s, x) => s + x).as("slow"))
    assert(df.where($"fast" =!= $"slow").count() === 0)
  }

  test("vec_ldot is null-safe and participates in whole-stage codegen") {
    val df = Seq((Some(Array(1L, 2L)), None: Option[Array[Long]])).toDF("a", "b")
      .select(call_function("vec_ldot", $"a", $"b").as("d"))
    assert(df.head().isNullAt(0))
    // arrays built from plain exprs (a `transform` HOF here would itself
    // break codegen for the whole projection) over a non-local range scan
    val planned = spark.range(100)
      .select(array((0 until 64).map(i => $"id" + i): _*).as("a"),
        array((0 until 64).map(i => lit(i.toLong * 2)): _*).as("b"))
      .select(call_function("vec_ldot", $"a", $"b").as("d"))
    // `*(n)` prefixes mark whole-stage-codegen'd operators in the plan dump
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("vec_ldot")), plan)
    assert(planned.agg(sum($"d")).head().getLong(0) ===
      (0L until 100L).map(id => (0L until 64L).map(i => (i + id) * (i * 2)).sum).sum)
  }
}
