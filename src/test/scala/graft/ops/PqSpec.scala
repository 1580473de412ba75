package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q90 product quantization: trained on a planted 4-cluster corpus
  * where recall, exactness, and determinism are all independently
  * checkable:
  *
  *   - recall: clusters are far apart (block value 10.0 vs jitter
  *     ≤ 0.04), so every query's ADC top-1 must land in the query's
  *     own cluster;
  *   - exactness: ADC distances from the relational plan must equal a
  *     plain-Scala recomputation from the STAGED tables — the integer
  *     claim ("no doubles anywhere") checked end to end;
  *   - determinism: the trained codebook and code assignments are
  *     bit-identical regardless of input partitioning (exact BIGINT
  *     sums + floorDiv means + md5 seeding).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val nVec = 40
  private def cluster(id: Int): Int = id % 4

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val rows = (0 until nVec).map { id =>
      val c = cluster(id)
      val emb = Array.tabulate(64) { dim =>
        val base = if (dim / 16 == c) 10.0f else 0.0f
        base + 0.01f * ((id + dim) % 5)
      }
      (id.toLong, emb.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val out: Seq[(Long, Int, Long, Long)] =
    Similarity.q90PqAdc(spark, dir)
      .as[(Long, Int, Long, Long)].collect().toSeq

  test("q90: every query's ADC top-1 lands in the query's planted cluster") {
    val top1 = out.filter(_._2 == 1)
    assert(top1.size === 20)
    top1.foreach { case (q, _, n, _) =>
      assert(cluster(q.toInt) === cluster(n.toInt),
        s"query $q top-1 neighbor $n crossed clusters")
    }
  }

  test("q90: plan ADC distances equal a plain-Scala replay of the staged tables") {
    out // force staging
    val work = Dedup.stageRoot(dir)
    val codes = spark.read.parquet(s"$work/pq_codes")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val cb = spark.read.parquet(s"$work/pq_codebook")
      .as[(Int, Int, Int, Long)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.sortBy(_._3).map(_._4).toArray).toMap
    val scaled = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(x => math.floor(x.toDouble * 65536.0).toLong).toArray
      }.toMap
    def adc(q: Long, v: Long): Long =
      (0 until 4).map { sub =>
        val cw = cb((sub, codes(v)(sub)))
        val qs = scaled(q).slice(sub * 16, sub * 16 + 16)
        qs.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    out.foreach { case (q, _, n, dist) =>
      assert(dist === adc(q, n), s"ADC mismatch for ($q, $n)")
    }
    // and the ranking really is the global top-5 of the replay
    out.groupBy(_._1).foreach { case (q, rows) =>
      val full = scaled.keys.filter(_ != q).map(v => (adc(q, v), v)).toSeq.sorted
      assert(rows.sortBy(_._2).map(r => (r._4, r._3)) === full.take(5),
        s"top-5 mismatch for query $q")
    }
  }

  test("q91: composed IVF-PQ keeps top-1 in-cluster and prices only in-cell candidates") {
    val rows = Similarity.q91IvfPq(spark, dir)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.filter(_._2 == 1).foreach { case (q, _, n, _) =>
      assert(cluster(q.toInt) === cluster(n.toInt),
        s"query $q top-1 neighbor $n crossed clusters")
    }
    // candidate pruning is real: every returned neighbor shares the
    // query's trained coarse cell
    val cells = spark.read.parquet(s"${Dedup.stageRoot(dir)}/cells")
      .as[(Long, Int)].collect().toMap
    rows.foreach { case (q, _, n, _) =>
      assert(cells(q) === cells(n), s"($q,$n) crossed cells")
    }
  }

  test("q93: ingested batch encodes like the corpus and search stays in-cluster") {
    val rows = Similarity.q93PqIngest(spark, dir)
      .as[(Long, Int, Long, Long)].collect().toSeq
    rows.filter(_._2 == 1).foreach { case (q, _, n, _) =>
      assert(cluster(q.toInt) === cluster(n.toInt),
        s"query $q top-1 neighbor $n crossed clusters")
    }
    // the batch's codes in the refreshed staged index are exactly what
    // the trained encoder assigns — re-encode the batch independently
    val work = Dedup.stageRoot(dir)
    val staged = spark.read.parquet(s"$work/pq_codes_ingest")
      .where($"vec_id" % 10 === 9)
      .as[(Long, Int, Int)].collect().toSet
    assert(staged.nonEmpty)
    val iv = Similarity.scaledVectors(spark, dir).select($"vec_id", $"v")
    val (cb, _) = Similarity.trainPq(
      iv.where($"vec_id" % 10 =!= 9).localCheckpoint())
    val reencoded = Similarity.pqCodes(iv.where($"vec_id" % 10 === 9), cb)
      .select($"vec_id", $"sub", $"code")
      .as[(Long, Int, Int)].collect().toSet
    assert(staged === reencoded)
  }

  test("q93: batch encoding is a pure map stage — no shuffle") {
    val iv = Similarity.scaledVectors(spark, dir).select($"vec_id", $"v")
    val (cb, _) = Similarity.trainPq(
      iv.where($"vec_id" % 10 =!= 9).localCheckpoint())
    val p = Similarity.pqCodes(iv.where($"vec_id" % 10 === 9), cb)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("q90: codebook and codes are partition-invariant") {
    val iv = Similarity.scaledVectors(spark, dir)
      .select($"vec_id", $"v")
    val (cb1, codes1) = Similarity.trainPq(iv.repartition(1).localCheckpoint())
    val (cb7, codes7) = Similarity.trainPq(iv.repartition(7).localCheckpoint())
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq === cb7.map(_.map(_.toSeq).toSeq).toSeq)
    assert(codes1.orderBy("vec_id", "sub").collect().toSeq ===
      codes7.orderBy("vec_id", "sub").collect().toSeq)
  }
}
