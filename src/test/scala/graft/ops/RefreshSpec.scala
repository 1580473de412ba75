package graft.ops

import graft.SparkSpec

/** Batch-linear codebook refresh (q161): the staged (Σv, n) sufficient
  * statistics absorb a nightly batch by integer addition, so the
  * refreshed centroid is the EXACT weighted mean over corpus ∪ batch —
  * not an approximation. Planted geometry (IvfIngestSpec's): four
  * orthogonal corpus clusters of 3 vectors each (ids 0–2, 30–32,
  * 40–42, 50–52), batch ids 9 (A-like) and 19 (C-like). Pins:
  *
  *   - the staged corpus sums are exactly the planted members' scaled
  *     component sums (membership + frozen-assignment evidence)
  *   - a refreshed centroid equals the closed-form weighted mean
  *     ((Σcorpus + Σbatch) / (n+1)) / 2^16 to the LAST BIT
  *   - a cluster the batch never touches keeps its centroid bit-exact
  *   - a second (warm) invocation returns identical rows
  */
class RefreshSpec extends SparkSpec {
  import spark.implicits._

  private def bvec(axis: Int, leanAxis: Int, lean: Float, jitter: Float) =
    Array.tabulate(64) { i =>
      (if (i / 8 == axis) 1.0f else if (i / 8 == leanAxis) lean else 0.0f) +
        (if (i == 63) jitter else 0.0f)
    }

  private lazy val vecs: Map[Long, Array[Float]] = Map(
    0L -> bvec(0, 2, 0f, 0.00f), 1L -> bvec(0, 2, 0f, 0.02f),
    2L -> bvec(0, 2, 0f, 0.04f),
    30L -> bvec(2, 0, 0f, 0.00f), 31L -> bvec(2, 0, 0f, 0.02f),
    32L -> bvec(2, 0, 0f, 0.04f),
    40L -> bvec(4, 0, 0f, 0.00f), 41L -> bvec(4, 0, 0f, 0.02f),
    42L -> bvec(4, 0, 0f, 0.04f),
    50L -> bvec(6, 0, 0f, 0.00f), 51L -> bvec(6, 0, 0f, 0.02f),
    52L -> bvec(6, 0, 0f, 0.04f),
    9L -> bvec(0, 2, 0.1f, 0.01f),
    19L -> bvec(4, 0, 0.1f, 0.01f))

  private def scaled(id: Long): Array[Long] =
    vecs(id).map(x => math.floor(x.toDouble * 65536.0).toLong)

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-refresh").toString
    vecs.toSeq.sortBy(_._1).map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  // (cluster, dim) -> (centroid, n_vectors)
  private lazy val refreshed: Map[(Int, Int), (Double, Long)] =
    Similarity.q161CodebookRefresh(spark, dir)
      .as[(Int, Int, Double, Long)].collect()
      .map { case (c, d, ctr, n) => (c, d) -> (ctr, n) }.toMap

  private lazy val batchCell: Map[Long, Int] = {
    refreshed // force staging
    spark.read.parquet(s"${Dedup.stageRoot(dir)}/cb_batch")
      .as[(Long, Int)].collect().toMap
  }

  private lazy val corpusSums: Map[(Int, Int), (Long, Long)] =
    spark.read.parquet(s"${Dedup.stageRoot(dir)}/cb_sums")
      .as[(Int, Int, Long, Long)].collect()
      .map { case (c, p, s, n) => (c, p) -> (s, n) }.toMap

  test("staged corpus sums are exactly the planted members' scaled sums") {
    val cA = batchCell(9L)
    val expected = Array.tabulate(64) { d =>
      Seq(0L, 1L, 2L).map(id => scaled(id)(d)).sum
    }
    (0 until 64).foreach { d =>
      assert(corpusSums((cA, d)) === ((expected(d), 3L)),
        s"dim $d of the A cluster's staged sums")
    }
  }

  test("refreshed centroid is the bit-exact weighted mean over corpus + batch") {
    val cA = batchCell(9L)
    val s9 = scaled(9L)
    (0 until 64).foreach { d =>
      val (csum, cn) = corpusSums((cA, d))
      val exact = ((csum + s9(d)).toDouble / (cn + 1L)) / 65536.0
      val (got, n) = refreshed((cA, d + 1))
      assert(n === 4L, s"dim $d n_vectors")
      assert(got === exact, s"dim $d: got $got expected $exact")
    }
  }

  test("a cluster the batch never touches keeps its centroid to the last bit") {
    val touched = Set(batchCell(9L), batchCell(19L))
    val untouched = refreshed.keys.map(_._1).toSet -- touched
    assert(untouched.size === 2, s"planted clusters merged: $touched")
    untouched.foreach { c =>
      (0 until 64).foreach { d =>
        val (csum, cn) = corpusSums((c, d))
        assert(cn === 3L)
        val (got, n) = refreshed((c, d + 1))
        assert(n === 3L)
        assert(got === (csum.toDouble / cn) / 65536.0,
          s"cluster $c dim $d moved without batch members")
      }
    }
  }

  test("a warm second invocation returns identical rows") {
    val again = Similarity.q161CodebookRefresh(spark, dir)
      .as[(Int, Int, Double, Long)].collect()
      .map { case (c, d, ctr, n) => (c, d) -> (ctr, n) }.toMap
    assert(again === refreshed)
  }
}
