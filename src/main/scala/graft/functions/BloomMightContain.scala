package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a BIGINT column —
  * `bloom_might_contain(h, filter_bytes)` where `filter_bytes` is a
  * foldable BINARY literal holding a serialized
  * `org.apache.spark.util.sketch.BloomFilter`.
  *
  * Why a custom Catalyst expression: the prefilter in
  * [[graft.ops.Dedup.q59BloomDecontaminate]] runs against EVERY corpus
  * shingle, and a Scala UDF there splits whole-stage codegen and pays a
  * catalyst↔scala conversion per row — measured at the 30× scale probe
  * as 100 s vs 14 s for the exact variant the Bloom version is supposed
  * to beat. This expression keeps the probe inside the codegen'd stage:
  * the filter deserializes once per executor (`addReferenceObj`) and
  * each row is a primitive `mightContainLong` call.
  *
  * Same design as Spark's internal `BloomFilterMightContain` (used by
  * the runtime-filter rule, not SQL-registered): the filter side must
  * be foldable so it is deserialized once, never per row.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain requires a foldable (constant) filter argument")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects (BIGINT, BINARY), got " +
            s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  // elide the multi-KB serialized-filter literal from plan dumps —
  // toString lands in explain output, the Spark UI, and event logs,
  // and a 4 KB hex blob per occurrence drowns the actual plan
  override def toString: String =
    s"bloom_might_contain($left, <bloom_filter>)"

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(bytes)
  }

  override def nullSafeEval(v: Any, ignoredBytes: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (h, _) => s"${ev.value} = $bf.mightContainLong($h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
