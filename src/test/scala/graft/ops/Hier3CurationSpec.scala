package graft.ops

import graft.SparkSpec

/** q166 — prototype pruning over the FORCED three-level index. The
  * claim this suite pins is the one the oracle row certifies at
  * sf0.01: curation does not know the quantizer's depth — and the
  * staged assignment under it here is GENUINELY hierarchical, not a
  * flat index renamed (the same occupancy pins as Hier3ServingSpec).
  */
class Hier3CurationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val work = Dedup.stageRoot(dir)

  // (cluster, rank, vec_id, proto)
  private lazy val got = Similarity.q166PrototypePruneHier3(spark, dir)
    .as[(Long, Int, Long, Double)].collect().toSeq

  test("the kept tail equals a plain-JVM replay over the three-level assignment") {
    got // force staging
    val cells = spark.read.parquet(s"$work/cells_hier3")
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Double])].collect()
      .map { case (id, e) =>
        (id, e.map(x => math.floor(x * 65536.0).toLong).toArray)
      }
      .filter { case (id, v) => v.exists(_ != 0L) && cells.contains(id) }
    val want = vecs.groupBy { case (id, _) => cells(id) }.toSeq.flatMap {
      case (c, members) =>
        val dims = members.head._2.length
        val csum = Array.fill(dims)(0L)
        members.foreach { case (_, v) =>
          var i = 0; while (i < dims) { csum(i) += v(i); i += 1 }
        }
        val cq = csum.map(x =>
          x / members.length) // JVM Long / == Spark div
        val cnrm = math.sqrt(cq.map(x => x * x).sum.toDouble)
        val cut = math.floor(
          members.length * Similarity.PrototypePruneFraction).toInt
        members.map { case (id, v) =>
          val dot = v.zip(cq).map { case (a, b) => a * b }.sum
          val nrm = math.sqrt(v.map(x => x * x).sum.toDouble)
          (id, dot.toDouble / (nrm * cnrm))
        }.sortBy { case (id, p) => (-p, id) }.zipWithIndex
          .collect { case ((id, p), i) if i + 1 > cut => (c, i + 1, id, p) }
    }.sortBy(r => (r._1, r._2))
    assert(got === want)
  }

  test("the cell space underneath is genuinely hierarchical") {
    got // force staging
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val (k1, k2, k3) = Similarity.hier3Sizing(n)
    val cells = spark.read.parquet(s"$work/cells_hier3")
      .select("cell").as[Long].collect().toSeq
    assert(cells.max < k1.toLong * k2 * k3)
    assert(cells.map(_ / k3).distinct.size > 1,
      "only one level-2 parent is occupied")
    assert(cells.distinct.size > k3,
      s"cell space no wider than one parent's $k3 leaves")
  }

  test("q166 never re-stages a warm three-level index") {
    got // force staging
    def mtime(name: String): Long =
      new java.io.File(s"$work/$name/_SUCCESS").lastModified()
    val mc = mtime("cells_hier3")
    Similarity.q166PrototypePruneHier3(spark, dir).collect()
    assert(mtime("cells_hier3") === mc, "q166 re-staged a warm index")
  }
}
