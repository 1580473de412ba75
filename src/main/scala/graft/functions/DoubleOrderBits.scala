package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Codegen'd order-preserving DOUBLE → BIGINT encoding —
  * `double_order_bits(d)`: the IEEE-754 bit pattern transformed so
  * SIGNED BIGINT comparison reproduces `java.lang.Double.compare`
  * exactly (negatives ascend, -0.0 < 0.0, NaN greatest — the same
  * total order Spark's sort and window `orderBy` use on doubles).
  * `l ^ ((l >> 63) & 0x7fffffffffffffffL)`: positives keep their
  * bits, negatives flip everything but the sign, so "more negative"
  * encodes smaller.
  *
  * Why a custom expression: the radix selection
  * ([[graft.ops.Selection]]) digit-decomposes a double ordering key
  * for every row of every candidate pass; Spark SQL exposes no
  * float-bits builtin, and a Scala UDF here would split whole-stage
  * codegen on the corpus scan ([[BloomMightContain]]'s measured
  * rationale). One `doubleToLongBits` + two ALU ops per row, inside
  * the generated code.
  */
case class DoubleOrderBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"double_order_bits expects DOUBLE, got ${t.simpleString(10)}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "double_order_bits"

  override def nullSafeEval(v: Any): Any = {
    val l = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    l ^ ((l >> 63) & 0x7fffffffffffffffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val l = ctx.freshName("bits")
      s"""
         |long $l = java.lang.Double.doubleToLongBits($d);
         |${ev.value} = $l ^ (($l >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): DoubleOrderBits = copy(child = newChild)
}
