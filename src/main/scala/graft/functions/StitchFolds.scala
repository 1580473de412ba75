package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Linear-time implementations of the two stitch folds. The naive
  * per-step [[StitchAggregator.step]] fold re-copies the growing contig
  * on every read — quadratic in contig length; these keep the
  * accumulator as a deque of string segments so each step moves only
  * the overlap/gap characters.
  */
object StitchFolds {

  /** Left fold over ascending-(offset,length,content) spans — the
    * semantics of `stitchedSpan`'s canonical order. Fully linear: every
    * case touches only the incoming read's characters.
    */
  def foldSorted(spans: IndexedSeq[Span]): Span = {
    require(spans.nonEmpty)
    val segs = new java.util.ArrayDeque[String]()
    var o = spans.head.offset
    var l = spans.head.length
    segs.addLast(spans.head.content)
    var i = 1
    while (i < spans.length) {
      val n = spans(i)
      val eC = o + l - 1
      val eN = n.offset + n.length - 1
      if (n.offset < o) {
        if (eN < o) { // A1: n disjoint-left
          segs.addFirst("N" * (o - n.offset - n.length))
          segs.addFirst(n.content)
          l = n.length + (o - n.offset - n.length) + l; o = n.offset
        } else if (eN > eC) { // A2: full replace
          segs.clear(); segs.addLast(n.content)
          o = n.offset; l = n.length
        } else { // A3: prepend first n.length-1 chars (as-spec'd)
          segs.addFirst(n.content.substring(0, n.length - 1))
          l = l + n.length - 1; o = n.offset
        }
      } else if (n.offset < eC) {
        if (eN > eC) { // B: append n's part past eC
          val from = o + l - n.offset
          segs.addLast(n.content.substring(from, n.length))
          l += n.length + n.offset - o - l
        } // B-else contained: no-op
      } else if (n.offset == eC) { // C: 1-base trim
        segs.addLast(n.content.substring(1))
        l += n.length - 1
      } else { // D: N gap
        segs.addLast("N" * (n.offset - o - l))
        segs.addLast(n.content)
        l += (n.offset - o - l) + n.length
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder
    segs.forEach(s => sb.append(s))
    Span(o, l, sb.toString)
  }

  /** Right fold `step(r0, step(r1, … rk))` over a PATH-ordered list —
    * linear for monotonic paths (the accumulated child span is the
    * deque; hot B/C/D cases trim its head and prepend own content).
    * Rare non-monotonic A-cases and containment fall back to the exact
    * [[StitchAggregator.step]] on the materialized accumulator.
    */
  def foldPath(path: List[Span]): Span = {
    require(path.nonEmpty)
    val segs = new java.util.ArrayDeque[String]()
    var o = path.last.offset
    var l = path.last.length
    segs.addFirst(path.last.content)
    var contentLen = path.last.content.length

    def dropHead(k0: Int): Unit = {
      var k = k0
      while (k > 0 && !segs.isEmpty) {
        val h = segs.pollFirst()
        if (h.length <= k) k -= h.length
        else { segs.addFirst(h.substring(k)); k = 0 }
      }
      contentLen -= math.min(k0, contentLen)
    }
    def materialize(): String = {
      val sb = new java.lang.StringBuilder(contentLen)
      segs.forEach(s => sb.append(s))
      sb.toString
    }
    def reset(s: Span): Unit = {
      segs.clear(); segs.addFirst(s.content)
      o = s.offset; l = s.length; contentLen = s.content.length
    }

    path.init.reverseIterator.foreach { own =>
      val eC = own.offset + own.length - 1 // own's inclusive end
      if (o < own.offset || (o >= own.offset && o + l - 1 <= eC && o < eC)) {
        // A-cases (child starts left of own) and B-else (contained):
        // rare on real paths — exact semantics via the plain step
        reset(StitchAggregator.step(own, Span(o, l, materialize())))
      } else if (o < eC) { // B: child extends past own's end
        dropHead(own.offset + own.length - o)
        segs.addFirst(own.content)
        contentLen += own.content.length
        val grow = l + o - own.offset - own.length
        l = own.length + grow; o = own.offset
      } else if (o == eC) { // C: inclusive-end adjacency, 1-base trim
        dropHead(1)
        segs.addFirst(own.content)
        contentLen += own.content.length
        l = own.length + l - 1; o = own.offset
      } else { // D: disjoint right of own — N gap
        val gap = o - own.offset - own.length
        segs.addFirst("N" * gap)
        segs.addFirst(own.content)
        contentLen += gap + own.content.length
        l = own.length + gap + l; o = own.offset
      }
    }
    Span(o, l, materialize())
  }
}

/** Catalyst expression folding a (pre-sorted) array of
  * `struct<offset:int, length:int, content:string>` spans into one span,
  * with the linear segment fold. `pathOrder = false` left-folds in the
  * array's order (ascending canonical order for `stitch_fold`);
  * `pathOrder = true` right-folds (`stitch_fold_path`) — the closed
  * form of the reference's bottom-up fixpoint over a path-ordered array.
  *
  * Why an expression and not the `aggregate()` HOF: the HOF's lambda
  * rebuilds the whole contig string per element (quadratic, and
  * interpreted); this eval runs once per group in JVM code. Registered
  * by [[graft.GraftExtensions]].
  */
case class StitchFoldExpr(child: Expression, pathOrder: Boolean)
    extends UnaryExpression with CodegenFallback {

  private val spanType = StructType(Seq(
    StructField("offset", IntegerType), StructField("length", IntegerType),
    StructField("content", StringType)))

  override def dataType: DataType = spanType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (pathOrder) "stitch_fold_path" else "stitch_fold"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 3 && s(0).dataType == IntegerType &&
          s(1).dataType == IntegerType && s(2).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<int,int,string>>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val spans = (0 until n).map { i =>
      val r = arr.getStruct(i, 3)
      Span(r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
    }
    val out =
      if (pathOrder) StitchFolds.foldPath(spans.toList)
      else StitchFolds.foldSorted(spans)
    InternalRow(out.offset, out.length, UTF8String.fromString(out.content))
  }

  override protected def withNewChildInternal(newChild: Expression): StitchFoldExpr =
    copy(child = newChild)
}
