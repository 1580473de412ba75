package graft

import org.apache.spark.sql.functions._

/** The round-15 `weak`'s removal, measured: plant a frame-hash corpus
  * ABOVE the old 64-bit containment banding's all-hot bound
  * (~PhashBandHotCap·2^16 ≈ 3.3M corpus frames) and run BOTH keyings
  * over the SAME table:
  *
  *  - the shipped 4×32-bit [[graft.ops.Multimodal.clipHashPairs]]
  *    must return EXACTLY the planted law's containment pairs (one
  *    clip per group at one offset) with zero hot buckets — average
  *    bucket occupancy at this size is ~10^-3;
  *  - the LEGACY 4×16-bit keying (re-created here verbatim from the
  *    round-15 fold, over the low hash word) must degrade wholesale:
  *    average occupancy ≈ frames/2^16 > the cap, so nearly every
  *    bucket is hot and the result collapses toward empty — the
  *    cliff the round-15 verdict named.
  *
  * Default 260k groups × (12 source + 6 clip frames) = 4.68M frames ≈
  * 1.4× the old bound. Hashes are splitmix64-finalized per
  * (group, frame) (weak single-xorshift mixes produce correlated
  * band keys — the q191 generator lesson), h0/h1 independent streams.
  * Asserts the new path's exactness and prints both keyings' pair /
  * hot-bucket counts as the SCALING.md row.
  */
object BandCliffProbe {
  private def smix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val groups = args.headOption.map(_.toLong).getOrElse(260000L)
    val spark = ScaleProbe.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    // planted law: per group g, doc 2g is a 12-frame source and doc
    // 2g+1 the clip of its frames 3..8 — ONE containment pair per
    // group at delta = clip_frame - source_frame = -3, n_aligned = 6
    val hashes = spark.range(0, groups)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .flatMap { g =>
        def h(f: Long) = (smix(g * 0x632BE59BD9B4E019L + f),
          smix(g * 0x632BE59BD9B4E019L + f + 0x100000000L))
        val src = (0L until 12L).map { f =>
          val (a, b) = h(f); (2 * g, f, a, b)
        }
        val clip = (0L until 6L).map { j =>
          val (a, b) = h(j + 3); (2 * g + 1, j, a, b)
        }
        src ++ clip
      }
      .toDF("doc_id", "frame_idx", "h0", "h1")
      .localCheckpoint()
    val nFrames = hashes.count()
    println(s"planted frames: $nFrames (old all-hot bound ~3.3M)")

    // ---- shipped 4×32-bit keying ----
    var t0 = System.nanoTime()
    val got = graft.ops.Multimodal.clipHashPairs(hashes)
      .localCheckpoint()
    val newPairs = got.count()
    val newLaw = got.where(col("doc_b") === col("doc_a") + 1 &&
      col("doc_a") % 2 === 0 && col("delta") === -3 &&
      col("n_aligned") === 6 && col("max_hamming") === 0).count()
    val newHot = if (newPairs > 0)
      got.agg(max(col("hot_buckets"))).first().getLong(0)
    else -1L
    val newSec = (System.nanoTime() - t0) / 1e9

    // ---- legacy 4×16-bit keying (the round-15 fold, verbatim, over
    // the low hash word) ----
    t0 = System.nanoTime()
    val nS = hashes.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    val bands = hashes.select(col("doc_id"), col("frame_idx"),
      col("h0").as("h"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, " +
        "shiftrightunsigned(h0, b * 16) & 65535 AS bkey))")).as("bk"))
      .select(col("doc_id"), col("frame_idx"), col("h"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val occ = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val cap = graft.ops.Multimodal.PhashBandHotCap
    val legacyHot = occ.where(col("n") > cap).count()
    val legacyBuckets = occ.count()
    val cold = bands.join(occ.where(col("n") <= cap)
        .select(col("band"), col("bkey")),
      Seq("band", "bkey"), "leftsemi")
    val legacyPairs = cold.as("x")
      .join(cold.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.frame_idx").as("fa"), col("y.frame_idx").as("fb"),
        col("x.h").as("pa"), col("y.h").as("pb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(pa ^ pb)").cast("long"))
      .where(col("hamming") <= 3)
      .groupBy(col("doc_a"), col("doc_b"),
        (col("fb") - col("fa")).as("delta"))
      .agg(count(lit(1)).as("n_aligned"))
      .join(nS.select(col("doc_id").as("doc_a"), col("ns").as("na")), "doc_a")
      .join(nS.select(col("doc_id").as("doc_b"), col("ns").as("nb")), "doc_b")
      .where(col("n_aligned") === least(col("na"), col("nb")))
      .count()
    val legacySec = (System.nanoTime() - t0) / 1e9

    println(s"""{"metric":"band_cliff_probe","frames":$nFrames,""" +
      s""""planted_pairs":$groups,"new_pairs":$newPairs,""" +
      s""""new_law_pairs":$newLaw,"new_hot_buckets":$newHot,""" +
      s""""new_sec":$newSec,"legacy_pairs":$legacyPairs,""" +
      s""""legacy_hot_buckets":$legacyHot,""" +
      s""""legacy_buckets":$legacyBuckets,"legacy_sec":$legacySec}""")
    assert(newPairs == groups && newLaw == groups,
      s"widened banding must return the planted law exactly: " +
        s"$newPairs/$newLaw vs $groups")
    assert(newHot == 0L, s"no bucket may be hot at 2^32 keys: $newHot")
    assert(legacyPairs < groups / 10,
      s"the legacy keying above its bound should collapse toward " +
        s"empty (got $legacyPairs of $groups)")
    spark.stop()
  }
}
