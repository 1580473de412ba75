package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomMightContain, CountMinEstimate, DoubleOrderBits, LongDotProduct, MaxMatchSegment, StitchFoldExpr, UnigramSegment}

/** Session extensions registering the engine's custom expressions —
  * installed via `spark.sql.extensions=graft.GraftExtensions` (all
  * entry points set it) or `withExtensions` in code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private[graft] val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_ldot",
      new ExpressionInfo(classOf[LongDotProduct].getName, "vec_ldot",
        "vec_ldot(a, b) - exact dot product of two BIGINT arrays (codegen)"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_ldot takes exactly 2 arguments")
        LongDotProduct(children.head, children(1))
      }),
    ("stitch_fold",
      new ExpressionInfo(classOf[StitchFoldExpr].getName, "stitch_fold",
        "stitch_fold(spans) - linear left fold of sorted interval spans"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "stitch_fold takes exactly 1 argument")
        StitchFoldExpr(children.head, pathOrder = false)
      }),
    ("stitch_fold_path",
      new ExpressionInfo(classOf[StitchFoldExpr].getName, "stitch_fold_path",
        "stitch_fold_path(spans) - linear right fold of path-ordered spans"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "stitch_fold_path takes exactly 1 argument")
        StitchFoldExpr(children.head, pathOrder = true)
      }),
    ("bloom_might_contain",
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain",
        "bloom_might_contain(h, filter) - codegen'd Bloom probe of a BIGINT " +
          "against a constant serialized BloomFilter"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "bloom_might_contain takes exactly 2 arguments")
        BloomMightContain(children.head, children(1))
      }),
    ("double_order_bits",
      new ExpressionInfo(classOf[DoubleOrderBits].getName, "double_order_bits",
        "double_order_bits(d) - order-preserving DOUBLE -> BIGINT encoding " +
          "(signed compare == Double.compare), codegen'd"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "double_order_bits takes exactly 1 argument")
        DoubleOrderBits(children.head)
      }),
    ("cms_estimate",
      new ExpressionInfo(classOf[CountMinEstimate].getName, "cms_estimate",
        "cms_estimate(token, sketch) - codegen'd count-min point query of a " +
          "STRING against a constant serialized CountMinSketch"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cms_estimate takes exactly 2 arguments")
        CountMinEstimate(children.head, children(1))
      }),
    ("max_match",
      new ExpressionInfo(classOf[MaxMatchSegment].getName, "max_match",
        "max_match(word, vocab) - codegen'd greedy longest-match subword " +
          "segmentation against a constant ARRAY<STRING> vocabulary"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "max_match takes exactly 2 arguments")
        MaxMatchSegment(children.head, children(1))
      }),
    ("unigram_segment",
      new ExpressionInfo(classOf[UnigramSegment].getName, "unigram_segment",
        "unigram_segment(word, vocab, logp) - codegen'd exact Viterbi " +
          "segmentation under a constant unigram LM (SentencePiece inference)"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "unigram_segment takes exactly 3 arguments")
        UnigramSegment(children.head, children(1), children(2))
      }))

  /** Idempotently install the custom functions into an arbitrary
    * session (one created WITHOUT the extensions config — e.g. the
    * driver's own session calling `SparkEntry.entry`). registerFunction
    * itself is idempotent and cheap (a map put), so there is no memo —
    * an identity-hash memo risked skipping registration on a hash
    * collision between sessions and grew unboundedly across session
    * churn.
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      org.apache.spark.sql.GraftFunctionRegistrar.register(spark, name, info, builder)
    }
}
