package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cluster-balanced sampling (q163): per staged IVF cell, the
  * bottom-ClusterSampleQuota vectors by a salted md5-derived 60-bit
  * key. Pins on the real sf0.001 table:
  *
  *   - the sample is EXACTLY the plain-Scala replay: an independent
  *     JVM-side md5 fold over the staged assignment elects the same
  *     bottom-k per cell, rank-for-rank
  *   - balance: every cell contributes min(quota, |cell|) rows — no
  *     cell dominates, no cell is skipped
  *   - a second invocation returns identical rows (determinism is by
  *     KEY, not RNG)
  */
class ClusterSampleSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def h60(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"cb:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    hex.foldLeft(0L)((acc, c) =>
      acc * 16 + "0123456789abcdef".indexOf(c))
  }

  // (cluster, rank, vec_id, label, h)
  private lazy val got =
    Similarity.q163ClusterBalancedSample(spark, dir)
      .as[(Int, Int, Long, Int, Long)].collect().toSeq

  test("the sample equals an independent plain-Scala bottom-k replay per cell") {
    got // force staging
    val cells = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/cells")
      .as[(Long, Int)].collect().toSeq
    val expected = cells.groupBy(_._2).toSeq.flatMap { case (c, members) =>
      members.map(_._1).sortBy(id => (h60(id), id))
        .take(Similarity.ClusterSampleQuota)
        .zipWithIndex.map { case (id, i) => (c, i + 1, id, h60(id)) }
    }.sortBy(r => (r._1, r._2))
    assert(got.map(r => (r._1, r._2, r._3, r._5)) === expected)
  }

  test("every cell contributes min(quota, cell size) rows") {
    val sizes = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/cells")
      .groupBy($"cluster").count()
      .as[(Int, Long)].collect().toMap
    val perCell = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perCell.keySet === sizes.keySet, "a cell was skipped")
    perCell.foreach { case (c, n) =>
      assert(n ===
        math.min(Similarity.ClusterSampleQuota.toLong, sizes(c)).toInt,
        s"cell $c contributed $n of ${sizes(c)}")
    }
  }

  test("a second invocation returns identical rows") {
    val again = Similarity.q163ClusterBalancedSample(spark, dir)
      .as[(Int, Int, Long, Int, Long)].collect().toSeq
    assert(again === got)
  }

  test("salted two-stage equals the plain single window on a planted mega-cell") {
    // one dup-saturated cluster (5000 members — far beyond quota·salts)
    // plus small cells: the exactness claim is that pre-cutting each
    // (cell, salt) slice to its bottom-quota drops nothing the global
    // bottom-quota needs, whatever the skew
    import org.apache.spark.sql.expressions.Window
    val rows = (0 until 5000).map(i => (i.toLong * 7 + 1, i % 3, 0)) ++
      (0 until 25).map(i => (100000L + i, 1, 1 + i % 4))
    val assigned = rows.toDF("vec_id", "label", "cluster")
    val salted = Similarity.clusterSampleElect(assigned)
      .as[(Int, Int, Long, Int, Long)].collect().toSeq
    val plainWin = Window.partitionBy($"cluster").orderBy($"h", $"vec_id")
    val plain = assigned
      .withColumn("h", Similarity.clusterSampleKey)
      .withColumn("rank", row_number().over(plainWin))
      .where($"rank" <= Similarity.ClusterSampleQuota)
      .select($"cluster", $"rank", $"vec_id", $"label", $"h")
      .orderBy($"cluster", $"rank")
      .as[(Int, Int, Long, Int, Long)].collect().toSeq
    assert(salted === plain)
    assert(salted.count(_._1 == 0) === Similarity.ClusterSampleQuota,
      "the mega-cell must still contribute exactly quota rows")
  }
}
