package graft.ops

import graft.SparkSpec

/** Prototype pruning (q164): per staged IVF cell, drop the
  * most-prototypical PrototypePruneFraction head (closest to the
  * re-quantized cell centroid), keep the hard tail. Pins on the real
  * sf0.001 table:
  *
  *   - the kept rows are EXACTLY an independent plain-JVM replay:
  *     integer centroid sums, the exact BIGINT-division re-quantization onto
  *     the 2^16 grid, the integer-dot cosine, the (proto desc, vec_id)
  *     rank over ALL members, and the floor(|cell|*p) cut all
  *     recomputed from the raw parquet + staged assignment —
  *     rank-for-rank and bit-for-bit on the double score
  *   - per-cell count: every cell keeps exactly
  *     |cell| - floor(|cell| * p) rows — no cell vanishes
  *   - a second invocation returns identical rows
  */
class PrototypePruneSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // (cluster, rank, vec_id, proto)
  private lazy val got =
    Similarity.q164PrototypePrune(spark, dir)
      .as[(Int, Int, Long, Double)].collect().toSeq

  /** Full per-cell ranking (rank, vec_id, proto) over ALL members,
    * recomputed in plain JVM arithmetic from the raw embeddings and
    * the staged assignment.
    */
  private lazy val replayFull: Map[Int, Seq[(Int, Long, Double)]] = {
    val cells = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/cells")
      .as[(Long, Int)].collect().toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Double])].collect()
      .map { case (id, e) =>
        (id, e.map(x => math.floor(x * 65536.0).toLong).toArray)
      }
      .filter { case (_, v) => v.exists(_ != 0L) }
      .filter { case (id, _) => cells.contains(id) }
    vecs.groupBy { case (id, _) => cells(id) }.map { case (c, members) =>
      val dims = members.head._2.length
      val csum = Array.fill(dims)(0L)
      members.foreach { case (_, v) =>
        var i = 0; while (i < dims) { csum(i) += v(i); i += 1 }
      }
      val cq = csum.map(_ / members.length) // JVM Long / == Spark div == DuckDB //
      val cnrm = math.sqrt(cq.map(x => x * x).sum.toDouble)
      val ranked = members.map { case (id, v) =>
        val dot = v.zip(cq).map { case (a, b) => a * b }.sum
        val nrm = math.sqrt(v.map(x => x * x).sum.toDouble)
        (id, dot.toDouble / (nrm * cnrm))
      }.sortBy { case (id, p) => (-p, id) }.zipWithIndex
        .map { case ((id, p), i) => (i + 1, id, p) }
      c -> ranked.toSeq
    }
  }

  private def cut(cellSize: Int): Int =
    math.floor(cellSize * Similarity.PrototypePruneFraction).toInt

  test("the kept tail equals an independent plain-JVM replay per cell") {
    got // force staging
    val want = replayFull.toSeq.flatMap { case (c, ranked) =>
      ranked.filter(_._1 > cut(ranked.size))
        .map { case (r, id, p) => (c, r, id, p) }
    }.sortBy(r => (r._1, r._2))
    assert(got === want)
  }

  test("every cell keeps exactly |cell| - floor(|cell| * p) rows") {
    got // force staging
    val perCell = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perCell.keySet === replayFull.keySet, "a cell vanished")
    perCell.foreach { case (c, n) =>
      val full = replayFull(c).size
      assert(n === full - cut(full), s"cell $c kept $n of $full")
    }
  }

  test("a second invocation returns identical rows") {
    val again = Similarity.q164PrototypePrune(spark, dir)
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(again === got)
  }
}
