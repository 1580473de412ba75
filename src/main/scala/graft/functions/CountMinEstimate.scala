package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd count-min-sketch point query over a STRING column —
  * `cms_estimate(token, sketch_bytes)` where `sketch_bytes` is a
  * foldable BINARY literal holding a serialized
  * `org.apache.spark.util.sketch.CountMinSketch` (the output of
  * Spark's `count_min_sketch` aggregate).
  *
  * Same shape as [[BloomMightContain]]: the sketch side must be
  * foldable so it deserializes ONCE per executor (`addReferenceObj`),
  * and the probe stays inside whole-stage codegen — a Scala UDF here
  * would split the stage and pay a catalyst↔scala conversion per row
  * (the 27× tax q59 measured on its Bloom probe).
  *
  * Hash consistency: `count_min_sketch`'s aggregate adds STRING rows
  * as their UTF-8 bytes (`sketch.addBinary(utf8.getBytes)`), so the
  * probe passes the SAME bytes to `estimateCount` — dispatching to the
  * binary-item hash, never Java-String hashing, keeping add and probe
  * bit-identical.
  */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "cms_estimate requires a foldable (constant) sketch argument")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cms_estimate expects (STRING, BINARY), got " +
            s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "cms_estimate"

  // elide the serialized-sketch literal from plan dumps (it is KBs of
  // hex that would drown explain output) — same policy as the Bloom probe
  override def toString: String = s"cms_estimate($left, <count_min_sketch>)"

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(item: Any, ignoredBytes: Any): Any =
    sketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cms = ctx.addReferenceObj("countMinSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (item, _) =>
      s"${ev.value} = $cms.estimateCount($item.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}
