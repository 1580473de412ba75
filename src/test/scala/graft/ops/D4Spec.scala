package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q165 D4 pipeline (SemDeDup → prototype prune) on a planted corpus
  * with known duplicate structure: two tight near-dup groups on
  * orthogonal block patterns (SemDedupSpec's geometry — in-group
  * cosine ≈ 1, cross-group ≈ 0) plus isolated vectors. Pins:
  *
  *   - the output is EXACTLY an independent plain-JVM replay of the
  *     whole composition: union-find connected components over the
  *     engine-staged sem_pairs, min-id survivor election, then the
  *     prototype scoring (integer centroid sums over SURVIVORS only,
  *     2^16 re-quantization, integer-dot cosine) and the
  *     floor(|cell|*p) cut — rank-for-rank, bit-for-bit
  *   - no semantic-duplicate non-survivor ever reaches the output
  *   - the dedup stage genuinely bites: at least one planted duplicate
  *     is absent, and the per-cell keep counts follow the floor rule
  *     over SURVIVOR cell sizes, not raw cell sizes
  */
class D4Spec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-d4").toString
    def vec(block: Int, jitter: Int): Seq[Float] =
      Array.tabulate(64) { dim =>
        (if (dim / 16 == block) 10.0f else 0.0f) +
          0.001f * ((jitter + dim) % 3)
      }.toSeq
    val rows = Seq(
      (0L, vec(0, 0), 0), (1L, vec(0, 1), 0), (2L, vec(0, 2), 0),
      (10L, vec(1, 0), 1), (11L, vec(1, 1), 1),
      (20L, vec(2, 0), 2), (21L, vec(3, 0), 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  // (cluster, rank, vec_id, proto)
  private lazy val got = Similarity.q165D4Pipeline(spark, dir)
    .as[(Int, Int, Long, Double)].collect().toSeq

  /** Non-survivors via plain union-find over the staged edge set. */
  private lazy val nonSurvivors: Set[Long] = {
    val pairs = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/sem_pairs")
      .as[(Long, Long)].collect().toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .filter(id => find(id) != id).toSet
  }

  /** The composition replayed in plain JVM arithmetic over the staged
    * assignment, restricted to survivors. */
  private lazy val replay: Seq[(Int, Int, Long, Double)] = {
    val cells = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/cells")
      .as[(Long, Int)].collect().toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
      .map { case (id, e) =>
        (id, e.map(x => math.floor(x.toDouble * 65536.0).toLong).toArray)
      }
      .filter { case (id, v) =>
        v.exists(_ != 0L) && cells.contains(id) && !nonSurvivors(id)
      }
    vecs.groupBy { case (id, _) => cells(id) }.toSeq.flatMap {
      case (c, members) =>
        val dims = members.head._2.length
        val csum = Array.fill(dims)(0L)
        members.foreach { case (_, v) =>
          var i = 0; while (i < dims) { csum(i) += v(i); i += 1 }
        }
        val cq = csum.map(_ / members.length) // JVM Long / == Spark div == DuckDB //
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
  }

  test("q165 equals the plain-JVM replay of the full composition") {
    got // force staging
    assert(got === replay)
  }

  test("no semantic-duplicate non-survivor reaches the output") {
    got // force staging
    assert(nonSurvivors.nonEmpty, "the planted corpus must contain dups")
    assert(got.map(_._3).toSet.intersect(nonSurvivors) === Set.empty)
  }

  test("the planted duplicates bite: group members beyond the min id are gone") {
    got // force staging
    // ids 1, 2 duplicate 0; id 11 duplicates 10 (SemDedupSpec pins the
    // staged edge set for this geometry)
    assert(nonSurvivors === Set(1L, 2L, 11L))
    val keptIds = got.map(_._3).toSet
    assert(!keptIds.contains(1L) && !keptIds.contains(2L) &&
      !keptIds.contains(11L))
  }
}
