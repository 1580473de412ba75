package graft.ops

import graft.SparkSpec
import graft.functions.Phash

/** [[Phash]] + q175 — the perceptual-hash image near-dup family.
  * The unit half proves the hash's one exact law (DCT shift
  * invariance) and its discriminative side on planted content; the
  * integration half pins q175's banded pipeline to the planted dup
  * groups and to a brute-force all-pairs Hamming scan.
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def raster(seed: Long): Array[Int] =
    Array.tabulate(Phash.Side * Phash.Side) { i =>
      // 4×4-cell constant content — the structure the planted table's
      // 8×8 source blocks take AFTER the 2×2 box downscale, so the
      // unit cases exercise exactly the coefficient structure q175 sees
      val bx = (i % Phash.Side) / 4; val by = i / Phash.Side / 4
      val k0 = seed * 0x9E3779B97F4A7C15L + bx * 0xC2B2AE3D27D4EB4FL +
        by * 0x165667B19E3779F9L
      val k = k0 ^ (k0 >>> 31)
      (2 * (((k % 120) + 120) % 120) + 8).toInt
    }

  test("global brightness shift leaves the hash bit-identical") {
    for (seed <- 0L until 50L; delta <- Seq(1, 2, 6, 40)) {
      val base = raster(seed)
      val shifted = base.map(_ + delta)
      assert(Phash.phash64(base) === Phash.phash64(shifted),
        s"seed=$seed delta=$delta")
    }
  }

  test("distinct scrambled rasters hash far apart (>> the d<=3 cut)") {
    val hs = (0L until 200L).map(s => Phash.phash64(raster(s)))
    val minD = (for {
      i <- hs.indices; j <- (i + 1) until hs.size
    } yield java.lang.Long.bitCount(hs(i) ^ hs(j))).min
    assert(minD > 3, s"minimum pairwise distance $minD")
  }

  test("local (non-global) perturbation moves few bits; big edits move many") {
    val base = raster(7L)
    // +2 on one 4x4 cell — a near-dup in pHash space
    val oneBlock = base.zipWithIndex.map { case (v, i) =>
      if (i % Phash.Side < 4 && i / Phash.Side < 4) v + 2 else v
    }
    val near = java.lang.Long.bitCount(
      Phash.phash64(base) ^ Phash.phash64(oneBlock))
    val far = java.lang.Long.bitCount(
      Phash.phash64(base) ^ Phash.phash64(raster(8L)))
    assert(near < far, s"near=$near far=$far")
  }

  test("hash refuses a wrong-sized raster by name") {
    val e = intercept[IllegalArgumentException](Phash.phash64(Array(1, 2, 3)))
    assert(e.getMessage.contains("32×32"))
    val e2 = intercept[IllegalArgumentException](Phash.phash128(Array(1)))
    assert(e2.getMessage.contains("32×32"))
  }

  test("128-bit variant: shift-invariant on both words, distinct rasters far") {
    // same DCT-linearity law as the 64-bit hash — a global brightness
    // shift moves only the pinned (0,0) bit, on the deeper corner too
    for (seed <- 0L until 30L; delta <- Seq(1, 6, 40)) {
      val base = raster(seed)
      assert(Phash.phash128(base) === Phash.phash128(base.map(_ + delta)),
        s"seed=$seed delta=$delta")
    }
    // discriminative side: scrambled rasters stay >> the d ≤ 3 cut on
    // the 128-bit distance (the containment fold's verify)
    val hs = (0L until 120L).map(s => Phash.phash128(raster(s)))
    val minD = (for {
      i <- hs.indices; j <- (i + 1) until hs.size
    } yield java.lang.Long.bitCount(hs(i)._1 ^ hs(j)._1) +
        java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)).min
    assert(minD > 3, s"minimum pairwise 128-bit distance $minD")
  }

  test("JPEG round-trip + box downscale reproduce the constructed luma exactly") {
    // the oracle's invertibility premise, asserted directly: decode +
    // 2×2 box mean of the planted 64×64 stream equals the construction
    // law's block gray at every position of the 32×32 hash raster
    val rows = Multimodal.phashJpegTable(spark, sfDir)
      .where($"doc_id" < 8).as[(Long, Array[Byte])].collect()
    assert(rows.length === 8)
    rows.foreach { case (id, payload) =>
      val img = Jpeg.decode(payload)
      assert(img.width === 2 * Phash.Side && img.height === 2 * Phash.Side)
      val luma = Multimodal.phashLuma(payload)
      val g = id / 4; val r = (id % 4).toInt
      var i = 0
      while (i < Phash.Side * Phash.Side) {
        // hash-raster cell (tx, ty) sits inside source block (tx/4, ty/4)
        val bx = (i % Phash.Side) / 4; val by = i / Phash.Side / 4
        val k0 = g * 0x9E3779B97F4A7C15L + bx * 0xC2B2AE3D27D4EB4FL +
          by * 0x165667B19E3779F9L
        val k = k0 ^ (k0 >>> 31)
        val want = (2 * (((k % 120) + 120) % 120) + 8 + 2 * r) & 0xff
        assert(luma(i) === want, s"doc $id cell $i")
        i += 1
      }
    }
  }

  test("q175 recovers exactly the planted dup groups, hamming 0, no hot buckets") {
    val got = Multimodal.q175ImagePhashPairs(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    val docs = graft.ops.Tables.t(spark, sfDir, "documents")
      .select($"doc_id").as[Long].collect().sorted
    val want = docs.groupBy(_ / 4).values.toSeq.flatMap { grp =>
      for (i <- grp.indices; j <- (i + 1) until grp.length)
        yield (grp(i), grp(j), 0L, 0L)
    }.sorted
    assert(got.toSeq.sorted === want)
    assert(got.forall(_._3 === 0L))
  }

  test("banded pair set equals a brute-force all-pairs Hamming scan at d<=3") {
    // perfect-recall pigeonhole claim, checked against the oracle-free
    // ground truth on the full sf0.001 hash table — over the 128-bit
    // hash the shipped banding keys on
    val hashes = Multimodal.phashJpegTable(spark, sfDir)
      .as[(Long, Array[Byte])].collect()
      .map { case (id, payload) =>
        (id, Phash.phash128(Multimodal.phashLuma(payload)))
      }
    val brute = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      d = java.lang.Long.bitCount(hashes(i)._2._1 ^ hashes(j)._2._1) +
        java.lang.Long.bitCount(hashes(i)._2._2 ^ hashes(j)._2._2)
      if d <= 3
    } yield {
      val (a, b) = (hashes(i)._1, hashes(j)._1)
      (math.min(a, b), math.max(a, b), d.toLong)
    }).sorted
    val got = Multimodal.q175ImagePhashPairs(spark, sfDir)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === brute)
  }
}
