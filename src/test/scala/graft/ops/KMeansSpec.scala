package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // three tight groups around orthogonal directions + one zero vector
  // (must be excluded, not crash) — deterministic, no RNG anywhere
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-kmeans").toString
    def vec(axis: Int, jitter: Float) =
      Array.tabulate(64)(i => (if (i / 8 == axis) 1.0f else 0.0f) +
        (if (i == 63) jitter else 0.0f))
    Seq(
      (0L, vec(0, 0.00f), 0), (1L, vec(0, 0.02f), 0), (2L, vec(0, 0.04f), 0),
      (3L, vec(3, 0.00f), 0), (4L, vec(3, 0.02f), 0),
      (5L, vec(6, 0.00f), 0), (6L, vec(6, 0.02f), 0),
      (7L, Array.fill(64)(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("k-means recovers the three planted directions and converges") {
    val (centroids, assigned) = Similarity.trainCodebook(spark, dir, k = 3, iters = 4)
    val byVec = assigned.as[(Long, Int)].collect().toMap
    // zero vector excluded from assignment entirely
    assert(!byVec.contains(7L))
    // planted groups land in one cluster each, all three distinct
    assert(Set(byVec(0L), byVec(1L), byVec(2L)).size === 1)
    assert(Set(byVec(3L), byVec(4L)).size === 1)
    assert(Set(byVec(5L), byVec(6L)).size === 1)
    assert(Set(byVec(0L), byVec(3L), byVec(5L)).size === 3)
    // each centroid points along its group's axis: the hot block of 8
    // dims dominates every other dim
    centroids.foreach { c =>
      val hot = c.grouped(8).map(_.sum).max
      assert(hot > 0.9 && c.sum < hot + 0.1, c.mkString(","))
    }
    // one more iteration changes nothing: converged
    val (_, again) = Similarity.trainCodebook(spark, dir, k = 3, iters = 5)
    assert(again.as[(Long, Int)].collect().toMap === byVec)
  }

  test("trained cells drive an end-to-end IVF search: in-cell top-1 is the true nearest") {
    // the q42 promise realized: swap `label` for trained assignments
    // and probe only the query's own cell
    val (_, assigned) = Similarity.trainCodebook(spark, dir, k = 3, iters = 4)
    val iv = Similarity.scaledVectors(spark, dir)
      .join(assigned, "vec_id")
      .select($"vec_id", $"cluster", $"v", $"nrm")
    val q = iv.where($"vec_id" === 0L)
      .select($"cluster", $"v".as("qv"), $"nrm".as("qn"))
    val hit = q.join(iv, Seq("cluster"))
      .where($"vec_id" =!= 0L)
      .select($"vec_id",
        (Similarity.idot($"qv", $"v").cast("double") / ($"qn" * $"nrm")).as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(1).as[(Long, Double)].head()
    // vec 1 (same axis, smallest jitter delta) is vec 0's true nearest
    assert(hit._1 === 1L, hit.toString)
  }

  test("k-means assignments are invariant to shuffle partitioning") {
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      val a = Similarity.trainCodebook(spark, dir, k = 3, iters = 3)
        ._2.as[(Long, Int)].collect().toMap
      spark.conf.set(key, "7")
      val b = Similarity.trainCodebook(spark, dir, k = 3, iters = 3)
        ._2.as[(Long, Int)].collect().toMap
      assert(a === b)
    } finally spark.conf.set(key, orig)
  }
}
