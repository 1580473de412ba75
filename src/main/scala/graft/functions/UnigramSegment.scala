package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The scored vocabulary + Viterbi kernel behind [[UnigramSegment]] —
  * built once per executor from the foldable (vocab, logp) literals
  * (`addReferenceObj`, the [[MaxMatchVocab]] discipline).
  *
  * `segment` is exact Viterbi over the segmentation lattice: dp[i] =
  * the max-total-log-prob segmentation of the first i characters,
  * dp[i] = max over vocab tokens t ending at i of dp[i−len(t)] +
  * logp(t). Ties break toward the LONGER final token (two distinct
  * tokens of equal length ending at one position are impossible —
  * they'd be the same substring — so the order is total and the
  * segmentation deterministic). A position no suffix of the vocab
  * covers fails by name, same contract as [[MaxMatchVocab]]: the
  * trainer guarantees single-character coverage, so an uncovered
  * word is a data bug worth crashing on, not an UNK.
  */
final class UnigramLattice(tokens: Array[String], logps: Array[Double])
    extends Serializable {
  require(tokens.length == logps.length,
    "unigram_segment: vocab and logp arrays differ in length")
  @transient private lazy val lp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](
      math.max(16, tokens.length * 2))
    var i = 0
    while (i < tokens.length) { m.put(tokens(i), logps(i)); i += 1 }
    m
  }
  @transient private lazy val maxLen: Int =
    if (tokens.isEmpty) 0 else tokens.iterator.map(_.length).max

  def segment(wordU: UTF8String): ArrayData = {
    val word = wordU.toString
    val n = word.length
    val score = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // length of the winning last token
    java.util.Arrays.fill(score, Double.NegativeInfinity)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = math.min(maxLen, i)
      while (l >= 1) {
        if (score(i - l) != Double.NegativeInfinity) {
          val p = lp.get(word.substring(i - l, i))
          if (p != null) {
            val s = score(i - l) + p.doubleValue
            // strict > plus descending l ⇒ on ties the LONGER token
            // wins (first writer), making the argmax total
            if (s > score(i) || (s == score(i) && l > back(i))) {
              score(i) = s
              back(i) = l
            }
          }
        }
        l -= 1
      }
      i += 1
    }
    if (score(n) == Double.NegativeInfinity)
      throw new IllegalStateException(
        s"unigram_segment: no vocab segmentation covers '$word' — the " +
          "trained vocabulary must contain every single character of " +
          "its corpus (trainUnigramLm invariant)")
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](4)
    var p = n
    while (p > 0) {
      val l = back(p)
      out += UTF8String.fromString(word.substring(p - l, p))
      p -= l
    }
    new GenericArrayData(out.reverse.toArray)
  }
}

/** Codegen'd exact Viterbi unigram segmentation —
  * `unigram_segment(word, vocab, logp)` with foldable ARRAY<STRING> /
  * ARRAY<DOUBLE> literals (the model-sized tokenizer state of one EM
  * round). The imperative-DP-as-custom-expression rationale of
  * [[MaxMatchSegment]] applies verbatim; the difference is the
  * objective — MaxMatch is greedy longest-match (WordPiece inference),
  * this maximizes total log-probability (SentencePiece-unigram
  * inference, and the E-step of its hard-EM trainer,
  * `graft.ops.Text.trainUnigramLm`).
  */
case class UnigramSegment(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(DoubleType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "unigram_segment requires foldable (constant) vocab and logp arguments")
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          s"unigram_segment expects (STRING, ARRAY<STRING>, ARRAY<DOUBLE>), " +
            s"got (${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "unigram_segment"

  override def toString: String = s"unigram_segment($first, <vocab>, <logp>)"

  @transient private lazy val lattice: UnigramLattice = {
    val va = second.eval().asInstanceOf[ArrayData]
    val pa = third.eval().asInstanceOf[ArrayData]
    val toks = new Array[String](va.numElements())
    var i = 0
    while (i < toks.length) { toks(i) = va.getUTF8String(i).toString; i += 1 }
    new UnigramLattice(toks, pa.toDoubleArray())
  }

  override def nullSafeEval(w: Any, ignoredV: Any, ignoredP: Any): Any =
    lattice.segment(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("unigramLattice", lattice,
      classOf[UnigramLattice].getName)
    nullSafeCodeGen(ctx, ev, (w, _, _) => s"${ev.value} = $l.segment($w);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): UnigramSegment =
    copy(first = newFirst, second = newSecond, third = newThird)
}
