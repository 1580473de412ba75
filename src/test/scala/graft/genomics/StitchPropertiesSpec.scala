package graft.genomics

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property tests for the stitch fold (SURVEY.md §5.2-4). 200 random
  * chains are checked per property, batched as groups into a single
  * aggregation job so the whole suite stays fast.
  */
class StitchPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val bases = "ACGT"
  private def randSeq(rng: Random, n: Int): String =
    Seq.fill(n)(bases(rng.nextInt(4))).mkString

  /** (group, reads) with strictly disjoint reads (case D only). */
  private def disjointChains(seed: Int): Seq[(Int, Seq[Read])] = {
    val rng = new Random(seed)
    (0 until 200).map { g =>
      val n = 1 + rng.nextInt(12)
      var offset = rng.nextInt(50)
      val reads = (0 until n).map { i =>
        val len = 2 + rng.nextInt(18)
        val r = Read(i.toLong, len, randSeq(rng, len), offset, 0.5)
        offset += len + 1 + rng.nextInt(30) // gap ≥ 1 → strictly disjoint
        r
      }
      g -> reads
    }
  }

  private def stitchAll(chains: Seq[(Int, Seq[Read])]) = {
    val rows = chains.flatMap { case (g, rs) =>
      rs.map(r => (g, r.offset, r.length, r.content))
    }.toDF("g", "offset", "length", "content")
    Assembly.stitchContigs(rows, "g")
      .collect()
      .map { case Row(g: Int, o: Int, l: Int, c: String) => g -> ((o, l, c)) }
      .toMap
  }

  test("disjoint chains: span length = last.end − first.offset; N count = total gap; content survives in order") {
    val chains = disjointChains(42)
    val got = stitchAll(chains)
    chains.foreach { case (g, rs) =>
      val (o, l, c) = got(g)
      val span = rs.last.offset + rs.last.length - rs.head.offset
      assert(o === rs.head.offset, s"group $g offset")
      assert(l === span, s"group $g length")
      assert(c.length === span, s"group $g content length")
      assert(c.count(_ == 'N') === span - rs.map(_.length).sum, s"group $g N count")
      // contents appear verbatim at their aligned positions
      rs.foreach { r =>
        assert(c.substring(r.offset - o, r.offset - o + r.length) === r.content,
          s"group $g read ${r.id} content at aligned position")
      }
    }
  }

  test("inclusive-end adjacent chains (case C): each hop trims exactly 1 base") {
    val rng = new Random(7)
    val chains = (0 until 200).map { g =>
      val n = 2 + rng.nextInt(10)
      var offset = rng.nextInt(50)
      val reads = (0 until n).map { i =>
        val len = 2 + rng.nextInt(18)
        val r = Read(i.toLong, len, randSeq(rng, len), offset, 0.5)
        offset += len - 1 // next starts at this read's inclusive end
        r
      }
      g -> reads
    }
    val got = stitchAll(chains)
    chains.foreach { case (g, rs) =>
      val (o, l, c) = got(g)
      assert(o === rs.head.offset)
      assert(l === rs.map(_.length).sum - (rs.size - 1), s"group $g length")
      assert(c === (rs.head.content +: rs.tail.map(_.content.drop(1))).mkString,
        s"group $g content")
    }
  }

  test("idempotence: folding a contained read is a no-op (case B-else)") {
    val rng = new Random(13)
    val cases = (0 until 200).map { g =>
      val len = 10 + rng.nextInt(40)
      val off = rng.nextInt(100)
      val acc = (off, len, randSeq(rng, len))
      // contained strictly inside (B requires offset_n < e_cur and e_n <= e_cur)
      val innerLen = 1 + rng.nextInt(len - 2)
      val innerOff = off + rng.nextInt(len - innerLen - 1)
      val n = (innerOff, innerLen, randSeq(rng, innerLen))
      (g, acc, n)
    }
    val df = cases.map { case (g, a, n) => (g, a, n) }.toDF("g", "a", "n")
      .select(col("g"), Assembly.stitchStep(
        struct($"a._1".as("offset"), $"a._2".as("length"), $"a._3".as("content")),
        struct($"n._1".as("offset"), $"n._2".as("length"), $"n._3".as("content"))).as("r"))
      .select($"g", $"r.offset", $"r.length", $"r.content")
      .collect().map { case Row(g: Int, o: Int, l: Int, c: String) => g -> ((o, l, c)) }
      .toMap
    cases.foreach { case (g, acc, _) => assert(df(g) === acc, s"case $g") }
  }

  test("iterative form agrees with closed form on random disjoint chains") {
    val chains = disjointChains(99).take(4)
    val expected = stitchAll(chains)
    chains.foreach { case (g, rs) =>
      val v = rs.zipWithIndex.map { case (r, i) =>
        (g * 1000L + i, if (i < rs.size - 1) g * 1000L + i + 1 else -1L,
          r.offset, r.length, r.content)
      }.toDF("id", "next_id", "offset", "length", "content")
      val out = Assembly.stitchIterative(v)
      val Row(o: Int, l: Int, c: String) = out
        .where($"id" === g * 1000L).select($"offset", $"length", $"content").head()
      assert((o, l, c) === expected(g), s"group $g")
    }
  }

  test("iterative fixpoint: EVERY vertex converges to its own chain's fold (shared successors)") {
    import graft.functions.{Span, StitchAggregator}
    val rng = new Random(31)
    val n = 12 // iterative cost is O(depth) supersteps — keep the spec fast
    // ascending offsets by id; next points strictly forward; several
    // vertices share a successor (in-branching — the re-merge path)
    val offsets = (0 until n).scanLeft(0)((o, _) => o + 29 + rng.nextInt(10)).take(n)
    val reads = (0 until n).map { i =>
      val len = 20 + rng.nextInt(15)
      (i.toLong, if (i == n - 1) -1L else (i + 1 + rng.nextInt(math.min(3, n - 1 - i))).toLong,
        offsets(i), len, randSeq(rng, len))
    }
    val df = reads.toDF("id", "next_id", "offset", "length", "content")
    val state = Assembly.stitchIterative(df, maxIters = 20)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    // frontier-scheduled form reaches the same fixpoint
    val frontier = Assembly.stitchIterativeFrontier(df, maxIters = 20)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(frontier === state)
    val byId = reads.map(r => r._1 -> r).toMap
    def chain(i: Long): List[Span] = {
      val (_, nx, o, l, c) = byId(i)
      Span(o, l, c) :: (if (nx == -1L) Nil else chain(nx))
    }
    (0 until n).foreach { i =>
      val spans = chain(i.toLong)
      val expected = spans.dropRight(1).foldRight(spans.last)((r, s) => StitchAggregator.step(r, s))
      assert(state(i.toLong) === ((expected.offset, expected.length, expected.content)),
        s"vertex $i")
    }
  }

  test("the three stitch forms agree: HOF closed form == UDAF == plain-Scala fold") {
    import graft.functions.{Span, StitchAggregator}
    val rng = new Random(21)
    // mixed-case chains: overlaps (B), adjacency (C), gaps (D)
    val chains = (0 until 100).map { g =>
      val n = 2 + rng.nextInt(8)
      var offset = rng.nextInt(30)
      val reads = (0 until n).map { i =>
        val len = 4 + rng.nextInt(16)
        val r = Read(i.toLong, len, randSeq(rng, len), offset, 0.5)
        offset += (len - 1) + rng.nextInt(8) // C boundary up through D gaps
        r
      }
      g -> reads
    }
    val hof = stitchAll(chains)
    spark.udf.register("stitch_span_t",
      org.apache.spark.sql.functions.udaf(StitchAggregator,
        org.apache.spark.sql.Encoders.product[Span]))
    val rows = chains.flatMap { case (g, rs) =>
      rs.map(r => (g, r.offset, r.length, r.content))
    }.toDF("g", "offset", "length", "content")
    val viaUdaf = rows.groupBy($"g")
      .agg(expr("stitch_span_t(offset, length, content)").as("r"))
      .select($"g", $"r.offset", $"r.length", $"r.content")
      .collect()
      .map { case Row(g: Int, o: Int, l: Int, c: String) => g -> ((o, l, c)) }
      .toMap
    chains.foreach { case (g, rs) =>
      val spans = rs.map(r => Span(r.offset, r.length, r.content))
        .sortBy(s => (s.offset, s.length, s.content))
      val scala = spans.tail.foldLeft(spans.head)(StitchAggregator.step)
      assert(hof(g) === ((scala.offset, scala.length, scala.content)), s"group $g hof")
      assert(viaUdaf(g) === hof(g), s"group $g udaf")
    }
  }
}
