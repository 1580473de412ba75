package graft.genomics

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Path-order fold semantics of [[Assembly.assembleFrom]] (ADVICE r1):
  * the closed form must fold in PATH order — the closed form of the
  * reference's bottom-up fixpoint — not in offset order, and the prune
  * phase must stay tag-only (the reference never consumes `valid`,
  * assembly_final.cpp:175), so the argmax can legally pick a dead end.
  *
  * Expectations come from an independent plain-Scala right fold of the
  * assembly_final.cpp:459-598 case analysis.
  */
class PathFoldSpec extends SparkSpec {
  import spark.implicits._

  private case class Span(o: Int, l: Int, c: String)

  /** Independent reimplementation of one merge-apply (own, child). */
  private def step(acc: Span, n: Span): Span = {
    val eC = acc.o + acc.l - 1
    val eN = n.o + n.l - 1
    if (n.o < acc.o) {
      if (eN < acc.o) Span(n.o, n.l + (acc.o - n.o - n.l) + acc.l,
        n.c + "N" * (acc.o - n.o - n.l) + acc.c)
      else if (eN > eC) Span(n.o, n.l, n.c)
      else Span(n.o, acc.l + n.l - 1, n.c.substring(0, n.l - 1) + acc.c)
    } else if (n.o < eC) {
      if (eN > eC) Span(acc.o, acc.l + (n.l + n.o - acc.o - acc.l),
        acc.c + n.c.substring(acc.o + acc.l - n.o, n.l))
      else acc
    } else if (n.o == eC) Span(acc.o, acc.l + n.l - 1, acc.c + n.c.substring(1))
    else Span(acc.o, acc.l + (n.o - acc.o - acc.l) + n.l,
      acc.c + "N" * (n.o - acc.o - acc.l) + n.c)
  }

  /** span_i = step(r_i, span_{i+1}) — the reference's converged state. */
  private def rightFold(path: Seq[Span]): Span =
    path.dropRight(1).foldRight(path.last)((r, s) => step(r, s))

  private def chainDf(reads: Seq[Span]) = {
    val v = reads.zipWithIndex.map { case (r, i) =>
      Read(i.toLong, r.l, r.c, r.o, 0.5)
    }.toDF()
    val e = reads.indices.dropRight(1).map(i => OverlapEdge(i.toLong, i + 1L)).toDF()
    (v, e)
  }

  test("pathWithHops labels hop distance along the chain") {
    val (v, e) = chainDf(Seq(Span(0, 5, "AAAAA"), Span(10, 5, "CCCCC"), Span(20, 5, "GGGGG")))
    val withNext = Assembly.bestSuccessor(v, e)
    val hops = Assembly.pathWithHops(withNext, 0L)
      .as[(Long, Long)].collect().toMap
    assert(hops === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("non-monotonic path folds in path order (A2 replace erases the source read)") {
    // r0 at 50, successor r1 at 0 (case A), r1's successor r2 at 100 (case D):
    // span1 = r1 ++ N*90 ++ r2 covers past r0's end, so A2 replaces r0 wholesale.
    val reads = Seq(Span(50, 10, "AAAAAAAAAA"), Span(0, 10, "CCCCCCCCCC"),
      Span(100, 10, "GGGGGGGGGG"))
    val expected = rightFold(reads)
    assert(!expected.c.contains("AAAAAAAAAA")) // offset-order fold WOULD keep r0
    val (v, e) = chainDf(reads)
    val Row(o: Int, l: Int, c: String) =
      Assembly.assembleFrom(v, e, source = 0L).head()
    assert((o, l, c) === ((expected.o, expected.l, expected.c)))
  }

  test("long chain exercises pointer-doubling rounds and matches the independent fold") {
    val rng = new scala.util.Random(5)
    var off = 0
    val reads = (0 until 64).map { _ =>
      val l = 3 + rng.nextInt(12)
      val s = Span(off, l, Seq.fill(l)("ACGT"(rng.nextInt(4))).mkString)
      off += l + rng.nextInt(4) // mix of B/C/D transitions
      s
    }
    val expected = rightFold(reads)
    val (v, e) = chainDf(reads)
    val Row(o: Int, l: Int, c: String) =
      Assembly.assembleFrom(v, e, source = 0L).head()
    assert((o, l, c) === ((expected.o, expected.l, expected.c)))
  }

  test("faithful tag-only prune: argmax may pick a dead end and the path stops there") {
    // 1 → {2 (score .9, dead end), 3 (score .1 → 4)}; dest = 4.
    val v = Seq(
      Read(1L, 5, "AAAAA", 0, 0.5),
      Read(2L, 5, "CCCCC", 10, 0.9),
      Read(3L, 5, "GGGGG", 10, 0.1),
      Read(4L, 5, "TTTTT", 20, 0.5)).toDF()
    val e = Seq(OverlapEdge(1L, 2L), OverlapEdge(1L, 3L), OverlapEdge(3L, 4L)).toDF()
    val Row(o: Int, l: Int, c: String) =
      Assembly.assembleFrom(v, e, source = 1L).head()
    // path 1 → 2 (dead end chosen over the pruned-in-spirit alternative)
    val expected = step(Span(0, 5, "AAAAA"), Span(10, 5, "CCCCC"))
    assert((o, l, c) === ((expected.o, expected.l, expected.c)))
    assert(!c.contains("TTTTT"))
  }

  test("assembleFrom on an absent source yields a null span (CLI reports it)") {
    val (v, e) = chainDf(Seq(Span(0, 5, "AAAAA"), Span(10, 5, "CCCCC")))
    val row = Assembly.assembleFrom(v, e, source = 999L).head()
    assert(row.isNullAt(0) && row.isNullAt(2))
  }
}
