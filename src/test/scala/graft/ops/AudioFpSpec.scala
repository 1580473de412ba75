package graft.ops

import graft.SparkSpec
import graft.functions.AudioFp

/** [[AudioFp]] + q176 — the acoustic-fingerprint audio near-dup
  * family. Unit half: the integer m²-scaling invariance and the
  * discriminative side; integration half: q176's banded pipeline pins
  * the planted dup groups and the brute-force all-pairs scan.
  */
class AudioFpSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def signal(seed: Long): Array[Short] =
    Array.tabulate(AudioFp.Frames128 * 32) { i =>
      val t = i / 32
      val k0 = seed * 0x9E3779B97F4A7C15L + t * 0xC2B2AE3D27D4EB4FL
      val k = k0 ^ (k0 >>> 31)
      val a = 2 * (((k % 1000) + 1000) % 1000) + 2
      (if (i % 2 == 0) a else -a).toShort
    }

  test("integer volume scaling leaves the fingerprint bit-identical") {
    for (seed <- 0L until 50L; m <- Seq(2, 3, 4)) {
      val base = signal(seed)
      val scaled = base.map(s => (s * m).toShort)
      assert(AudioFp.fingerprint64(base) === AudioFp.fingerprint64(scaled),
        s"seed=$seed m=$m")
      assert(AudioFp.fingerprint128(base) === AudioFp.fingerprint128(scaled),
        s"128: seed=$seed m=$m")
    }
  }

  test("equal adjacent frame energies stay a 0 bit under scaling too") {
    // plant E_1 == E_0 (same amplitude): strict > gives bit 1 = 0,
    // and m² scaling preserves the equality exactly
    val flat = Array.tabulate(AudioFp.Frames128 * 32)(i =>
      (if (i % 2 == 0) 100 else -100).toShort)
    val fp = AudioFp.fingerprint64(flat)
    assert(fp === 0L)
    assert(AudioFp.fingerprint64(flat.map(s => (s * 4).toShort)) === 0L)
    assert(AudioFp.fingerprint128(flat) === ((0L, 0L)))
    assert(AudioFp.fingerprint128(flat.map(s => (s * 4).toShort))
      === ((0L, 0L)))
  }

  test("distinct scrambled signals fingerprint far apart (>> the d<=3 cut)") {
    val hs = (0L until 200L).map(s => AudioFp.fingerprint128(signal(s)))
    val minD = (for {
      i <- hs.indices; j <- (i + 1) until hs.size
    } yield java.lang.Long.bitCount(hs(i)._1 ^ hs(j)._1) +
        java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)).min
    assert(minD > 3, s"minimum pairwise 128-bit distance $minD")
  }

  test("fingerprint refuses a too-short signal by name") {
    val e = intercept[IllegalArgumentException](
      AudioFp.fingerprint64(Array[Short](1, 2, 3)))
    assert(e.getMessage.contains("at least 64"))
    val e2 = intercept[IllegalArgumentException](
      AudioFp.fingerprint128(Array[Short](1, 2, 3)))
    assert(e2.getMessage.contains("at least 128"))
  }

  test("WAV round-trip reproduces the constructed samples exactly (PCM is lossless)") {
    val rows = Multimodal.fpWavTable(spark, sfDir)
      .where($"doc_id" < 8).as[(Long, Array[Byte])].collect()
    assert(rows.length === 8)
    rows.foreach { case (id, payload) =>
      val a = Wav.decode(payload)
      assert(a.sampleRate === 16000)
      val m = (id % 4).toInt + 1
      val want = signal(id / 4).map(s => (s * m).toShort)
      assert(a.samples.toSeq === want.toSeq, s"doc $id")
    }
  }

  test("q176 recovers exactly the planted dup groups, hamming 0, no hot buckets") {
    val got = Multimodal.q176AudioFpPairs(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    val docs = graft.ops.Tables.t(spark, sfDir, "documents")
      .select($"doc_id").as[Long].collect().sorted
    val want = docs.groupBy(_ / 4).values.toSeq.flatMap { grp =>
      for (i <- grp.indices; j <- (i + 1) until grp.length)
        yield (grp(i), grp(j), 0L, 0L)
    }.sorted
    assert(got.toSeq.sorted === want)
  }

  test("banded pair set equals a brute-force all-pairs Hamming scan at d<=3") {
    val hashes = Multimodal.fpWavTable(spark, sfDir)
      .as[(Long, Array[Byte])].collect()
      .map { case (id, payload) =>
        (id, AudioFp.fingerprint128(Wav.decode(payload).samples))
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
    val got = Multimodal.q176AudioFpPairs(spark, sfDir)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === brute)
  }
}
