package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One aligned-read span (mirrors the stitch algebra's struct). */
case class Span(offset: Int, length: Int, content: String)

/** The interval-stitch fold as a typed `Aggregator` UDAF — the Spark
  * equivalent of the reference's gather-monoid + apply pair
  * (/root/reference/assembly_final.cpp:330-396 buffer, :459-598 fold;
  * SURVEY §2.10 X2). Same semantics as the `aggregate()` HOF closed
  * form in [[graft.genomics.Assembly.stitchedSpan]]; this form exists
  * for (a) SQL ergonomics (`stitch_span(struct(...))` after
  * registration) and (b) demonstrating the custom-UDAF surface.
  *
  * Spark aggregation buffers merge in arbitrary order, but the fold is
  * order-sensitive — so the buffer accumulates spans and `finish` sorts
  * by (offset, length, content) before folding, making the aggregate
  * deterministic under any partitioning (the same canonical order the
  * HOF form uses).
  */
object StitchAggregator extends Aggregator[Span, List[Span], Span] {

  override def zero: List[Span] = Nil

  override def reduce(buf: List[Span], r: Span): List[Span] = r :: buf

  override def merge(a: List[Span], b: List[Span]): List[Span] = a ::: b

  /** Plain-Scala twin of assembly_final.cpp:459-598 / Assembly.stitchStep. */
  def step(acc: Span, n: Span): Span = {
    val eC = acc.offset + acc.length - 1
    val eN = n.offset + n.length - 1
    if (n.offset < acc.offset) {
      if (eN < acc.offset) // A1 disjoint-left
        Span(n.offset, n.length + (acc.offset - n.offset - n.length) + acc.length,
          n.content + "N" * (acc.offset - n.offset - n.length) + acc.content)
      else if (eN > eC) n // A2 covers-past-end: full replace
      else // A3 left-overlap (reference does not trim by true width)
        Span(n.offset, acc.length + n.length - 1,
          n.content.substring(0, n.length - 1) + acc.content)
    } else if (n.offset < eC) {
      if (eN > eC) // B extends right
        Span(acc.offset, acc.length + (n.length + n.offset - acc.offset - acc.length),
          acc.content + n.content.substring(acc.offset + acc.length - n.offset, n.length))
      else acc // B-else contained: no-op
    } else if (n.offset == eC) // C inclusive-end adjacency: 1-base trim
      Span(acc.offset, acc.length + n.length - 1, acc.content + n.content.substring(1))
    else // D disjoint-right: N gap
      Span(acc.offset, acc.length + (n.offset - acc.offset - acc.length) + n.length,
        acc.content + "N" * (n.offset - acc.offset - acc.length) + n.content)
  }

  override def finish(buf: List[Span]): Span =
    StitchFolds.foldSorted(
      buf.sortBy(s => (s.offset, s.length, s.content)).toIndexedSeq)

  override def bufferEncoder: Encoder[List[Span]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Span]]()
  override def outputEncoder: Encoder[Span] = Encoders.product[Span]
}
