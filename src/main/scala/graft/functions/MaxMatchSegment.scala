package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The vocabulary + greedy kernel behind [[MaxMatchSegment]], built
  * once per executor from the foldable vocab literal
  * (`addReferenceObj`, the [[BloomMightContain]] discipline) and
  * invoked as one virtual call per row so the scan stays inside
  * whole-stage codegen.
  *
  * `segment` is left-to-right greedy longest-match (MaxMatch — the
  * WordPiece inference rule): at each position take the LONGEST vocab
  * token matching the remaining prefix, never backtrack. Linear in
  * `word.length × maxTokenLen` hash probes. A position no vocab token
  * covers FAILS BY NAME rather than emitting a silent UNK or dropping
  * the word — the staged vocab contains every single character of the
  * corpus by construction ([[graft.ops.Text.stageMaxMatchVocab]]), so
  * coverage is an invariant worth crashing on, and the DuckDB oracle's
  * recursive replay would silently LOSE an uncovered word (its chain
  * stalls mid-word), turning a data bug into a hash mismatch instead
  * of an error.
  */
final class MaxMatchVocab(tokens: Array[String]) extends Serializable {
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, tokens.length * 2))
    tokens.foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int =
    if (tokens.isEmpty) 0 else tokens.iterator.map(_.length).max

  def segment(wordU: UTF8String): ArrayData = {
    val word = wordU.toString
    val n = word.length
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](4)
    var p = 0
    while (p < n) {
      var l = math.min(maxLen, n - p)
      while (l > 0 && !set.contains(word.substring(p, p + l))) l -= 1
      if (l == 0)
        throw new IllegalStateException(
          s"max_match: no vocab token covers position ${p + 1} of " +
            s"'$word' — the vocabulary must contain every single " +
            "character of its corpus (stageMaxMatchVocab invariant)")
      out += UTF8String.fromString(word.substring(p, p + l))
      p += l
    }
    new GenericArrayData(out.toArray)
  }
}

/** Codegen'd greedy longest-match subword segmentation —
  * `max_match(word, vocab)` where `vocab` is a foldable ARRAY<STRING>
  * literal (the staged, model-sized tokenizer artifact). Returns the
  * ARRAY<STRING> of pieces whose concatenation is exactly `word`.
  *
  * Why a custom Catalyst expression: the segmentation is per-row
  * imperative DP (greedy chain), which no composition of built-in
  * functions spells without a per-position self-join per round — and a
  * Scala UDF would split whole-stage codegen on the tokenizer-apply
  * scan, the same measured cliff that motivated
  * [[BloomMightContain]]. Here the vocab hash set builds once per
  * executor and each row costs one call into [[MaxMatchVocab]].
  */
case class MaxMatchSegment(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "max_match requires a foldable (constant) vocab argument")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"max_match expects (STRING, ARRAY<STRING>), got " +
            s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "max_match"

  // elide the vocab literal from plan dumps (the BloomMightContain
  // rationale: a few-hundred-token array per occurrence drowns the plan)
  override def toString: String = s"max_match($left, <vocab>)"

  @transient private lazy val vocab: MaxMatchVocab = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val toks = new Array[String](arr.numElements())
    var i = 0
    while (i < toks.length) {
      toks(i) = arr.getUTF8String(i).toString
      i += 1
    }
    new MaxMatchVocab(toks)
  }

  override def nullSafeEval(w: Any, ignoredVocab: Any): Any =
    vocab.segment(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("maxMatchVocab", vocab,
      classOf[MaxMatchVocab].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => s"${ev.value} = $v.segment($w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxMatchSegment =
    copy(left = newLeft, right = newRight)
}
