package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q160 — batch-perceptron distillation of the q68 quality gate. Pins
  * convergence on a planted separable set, the real-table accuracy
  * margin over the majority baseline, prediction/score consistency,
  * and bit-exact determinism of the integer training.
  */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("a planted linearly separable set trains to 100% within the fixed epochs") {
    // y = sign(x1 - x2) with a comfortable margin; bias and x3 inert
    val feats = (1 to 40).map { i =>
      val pos = i % 2 == 0
      val (a, b) = if (pos) (100L + i, 10L) else (10L, 100L + i)
      (if (pos) 1L else -1L, 1L, a, b, 0L)
    }.toDF("y", "x0", "x1", "x2", "x3")
    val w = Text.trainPerceptron(feats, Text.PerceptronEpochs)
    val acc = feats.select(col("y"),
        (lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
          lit(w(2)) * col("x2") + lit(w(3)) * col("x3")).as("s"))
      .select(when(col("s") > 0, 1L).otherwise(-1L) === col("y"))
      .as[Boolean].collect()
    assert(acc.forall(identity), s"planted set not separated, w=${w.toSeq}")
  }

  test("real-table training beats the majority baseline by a wide margin") {
    val got = Text.q160BatchPerceptron(spark, dir)
      .select("label", "pred", "score", "correct")
      .as[(Int, Int, Long, Boolean)].collect().toSeq
    assert(got.nonEmpty)
    val acc = got.count(_._4).toDouble / got.size
    val baseline = math.max(got.count(_._1 == 1), got.count(_._1 == -1))
      .toDouble / got.size
    assert(acc >= 0.95, s"training accuracy $acc below 0.95")
    assert(acc > baseline + 0.2,
      s"accuracy $acc does not clear the majority baseline $baseline")
    // score/pred/correct are mutually consistent
    got.foreach { case (label, pred, score, correct) =>
      assert(pred === (if (score > 0) 1 else -1))
      assert(correct === (pred == label))
    }
  }

  test("training is bit-exact deterministic across runs") {
    val a = Text.q160BatchPerceptron(spark, dir).collect().toSeq
    val b = Text.q160BatchPerceptron(spark, dir).collect().toSeq
    assert(a === b)
  }

}
