package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q124: engine features (decode → 11-dim integer embedding) equal a
  * plain-Scala recompute straight from the construction law, and the
  * exact-L2 top-1 neighbor equals a plain-Scala argmin — so decoder,
  * featurizer, and search are pinned independently of the DuckDB
  * oracle that also re-derives them.
  */
class ImageEmbedSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def refFeat(id: Long): (Long, Seq[Long]) = {
    val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
    val n = w * h
    var rs = 0L; var gs = 0L; var bs = 0L
    val hist = Array.fill(8)(0L)
    for (p <- 0 until n) {
      val r = ((id * 31 + 3 * p) % 256).toInt
      val g = ((id * 31 + 3 * p + 1) % 256).toInt
      val b = ((id * 31 + 3 * p + 2) % 256).toInt
      rs += r; gs += g; bs += b
      hist(((r + g + b) / 3) / 32) += 1
    }
    (n.toLong, Seq(rs / n, gs / n, bs / n) ++ hist)
  }

  private lazy val rows = Multimodal.q124ImageEmbed(spark, dir).collect()

  test("features equal the construction-law recompute for every doc") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, f) = refFeat(id)
      assert(r.getAs[Long]("n_px") === n, s"doc $id")
      val got = Seq("r_mean", "g_mean", "b_mean").map(r.getAs[Long]) ++
        (0 until 8).map(i => r.getAs[Long](s"h$i"))
      assert(got === f, s"doc $id")
    }
  }

  test("top-1 neighbor equals the plain-Scala exact-L2 argmin") {
    val feats = rows.map(r => r.getAs[Long]("doc_id") ->
      refFeat(r.getAs[Long]("doc_id"))._2).toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.filter(_.getAs[Long]("doc_id") < 20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nnId, nnD2) = feats.filter(_._1 != id)
        .map { case (c, f) => (c, d2(feats(id), f)) }
        .minBy { case (c, d) => (d, c) }
      assert(r.getAs[Long]("nn_id") === nnId, s"doc $id")
      assert(r.getAs[Long]("nn_d2") === nnD2, s"doc $id")
    }
    // docs >= 20 carry no NN columns
    assert(rows.filter(_.getAs[Long]("doc_id") >= 20)
      .forall(r => r.isNullAt(r.fieldIndex("nn_id"))))
  }

  test("q125 resize hash equals the construction-law rolling fold") {
    val M = 1L << 53
    def refHash(id: Long): Long = {
      val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
      var hsh = 0L
      for (ty <- 0 until 3; tx <- 0 until 4; c <- 0 until 3) {
        val ys = ty * h / 3; val xs = tx * w / 4
        val v = ((id * 31 + 3 * (ys * w + xs) + c) % 256).toInt
        hsh = (hsh * 131 + v) % M
      }
      hsh
    }
    val got = Multimodal.q125ImageResize(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("rhash") === refHash(id), s"doc $id")
      assert(r.getAs[Int]("out_w") === 4 && r.getAs[Int]("out_h") === 3)
    }
  }
}
