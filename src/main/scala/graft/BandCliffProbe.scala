package graft

import org.apache.spark.sql.functions._

/** The round-15/16 `weak`s' removal, measured across the WHOLE
  * banded-Hamming family: plant a hash corpus ABOVE the old 4×16-bit
  * keying's all-hot bound (~cap·2^16 ≈ 3.3M rows per key space) and
  * run BOTH keyings over the SAME table, for each fold:
  *
  *  - `clip`  — the offset-free containment fold (q186/q191),
  *    widened in round 16;
  *  - `flat`  — the shared bandedHammingPairs core (q175 image
  *    pHash / q176 audio fingerprint and the hammingStarStream
  *    ingest twin), widened in round 17;
  *  - `frame` — q185's position-keyed fold (every video shares the
  *    frame-0 key space, so the per-position corpus bound is the
  *    same cliff), widened in round 17;
  *  - `simhash` — q122's 128-bit text-signature banding (32-char
  *    string band keys ≡ 32-bit space), widened in round 17.
  *
  * For the clip fold specifically:
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

    println(s"""{"metric":"band_cliff_probe","fold":"clip","frames":$nFrames,""" +
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

    // each section sizes its corpus to the clip section's measured
    // collapse density (~4.68M rows per 4×2^16 key space, avg bucket
    // occupancy ~71 ≫ cap 50 — at ~55 a quarter of buckets stay cold
    // and the legacy path limps instead of collapsing)
    flatSection(spark, 9 * groups)
    frameSection(spark, 9 * groups)
    simhashSection(spark, 9 * groups)
    spark.stop()
  }

  /** `flat`: per group g, docs 2g and 2g+1 share a splitmix 128-bit
    * hash — ONE hamming-0 pair per group; distinct groups scramble-
    * far. The caller sizes `groups` so 2·groups rows cross the old
    * ~3.3M all-hot bound (default 2.34M groups → 4.68M rows, the
    * clip section's collapse density). Runs the SHIPPED 4×32
    * bandedHammingPairs beside the legacy 4×16 keying over the low
    * word.
    */
  private def flatSection(spark: org.apache.spark.sql.SparkSession,
      groups: Long): Unit = {
    import spark.implicits._
    val cap = graft.ops.Multimodal.PhashBandHotCap
    val hashes = spark.range(0, groups)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .flatMap { g =>
        val a = smix(g * 0x632BE59BD9B4E019L + 0x9E37L)
        val b = smix(g * 0x632BE59BD9B4E019L + 0x79B9L)
        Seq((2 * g, a, b), (2 * g + 1, a, b))
      }
      .toDF("doc_id", "h0", "h1")
      .localCheckpoint()
    val n = hashes.count()

    var t0 = System.nanoTime()
    val got = graft.ops.Multimodal.bandedHammingPairs(hashes)
      .localCheckpoint()
    val newPairs = got.count()
    val newLaw = got.where(col("doc_b") === col("doc_a") + 1 &&
      col("doc_a") % 2 === 0 && col("hamming") === 0).count()
    val newHot = if (newPairs > 0)
      got.agg(max(col("hot_buckets"))).first().getLong(0) else -1L
    val newSec = (System.nanoTime() - t0) / 1e9

    // legacy 4×16-bit keying over the low word (the round-16 fold)
    t0 = System.nanoTime()
    val bands = hashes.select(col("doc_id"), col("h0").as("h"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, " +
        "shiftrightunsigned(h0, b * 16) & 65535 AS bkey))")).as("bk"))
      .select(col("doc_id"), col("h"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val occ = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val legacyHot = occ.where(col("n") > cap).count()
    val cold = bands.join(occ.where(col("n") <= cap)
        .select(col("band"), col("bkey")),
      Seq("band", "bkey"), "leftsemi")
    val legacyPairs = cold.as("x")
      .join(cold.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        col("x.h").as("pa"), col("y.h").as("pb"))
      .distinct()
      .where(expr("bit_count(pa ^ pb)") <= 3)
      .count()
    val legacySec = (System.nanoTime() - t0) / 1e9

    println(s"""{"metric":"band_cliff_probe","fold":"flat","rows":$n,""" +
      s""""planted_pairs":$groups,"new_pairs":$newPairs,""" +
      s""""new_law_pairs":$newLaw,"new_hot_buckets":$newHot,""" +
      s""""new_sec":$newSec,"legacy_pairs":$legacyPairs,""" +
      s""""legacy_hot_buckets":$legacyHot,"legacy_sec":$legacySec}""")
    assert(newPairs == groups && newLaw == groups && newHot == 0L,
      s"flat: $newPairs/$newLaw of $groups, hot $newHot")
    assert(legacyPairs < groups / 10,
      s"flat legacy should collapse: $legacyPairs of $groups")
  }

  /** `frame`: per group g, TWO 2-frame videos hash identically per
    * position — one all-frames pair per group; the caller sizes
    * `groups` so the PER-POSITION corpus (2·groups rows at frame 0)
    * crosses the old 3.3M bound at collapse density — exactly the
    * q185 cliff (frame keying narrows buckets but every video has a
    * frame 0).
    */
  private def frameSection(spark: org.apache.spark.sql.SparkSession,
      groups: Long): Unit = {
    import spark.implicits._
    val cap = graft.ops.Multimodal.PhashBandHotCap
    val hashes = spark.range(0, groups)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .flatMap { g =>
        (0L until 2L).flatMap { f =>
          val a = smix(g * 0x632BE59BD9B4E019L + f * 31 + 5)
          val b = smix(g * 0x632BE59BD9B4E019L + f * 31 + 11)
          Seq((2 * g, f, a, b), (2 * g + 1, f, a, b))
        }
      }
      .toDF("doc_id", "frame_idx", "h0", "h1")
      .localCheckpoint()
    val n = hashes.count()

    var t0 = System.nanoTime()
    val got = graft.ops.Multimodal.videoHashPairs(hashes)
      .localCheckpoint()
    val newPairs = got.count()
    val newLaw = got.where(col("doc_b") === col("doc_a") + 1 &&
      col("doc_a") % 2 === 0 && col("n_frames") === 2 &&
      col("max_hamming") === 0).count()
    val newHot = if (newPairs > 0)
      got.agg(max(col("hot_buckets"))).first().getLong(0) else -1L
    val newSec = (System.nanoTime() - t0) / 1e9

    // legacy: per-(frame_idx, band) 16-bit keying over the low word
    t0 = System.nanoTime()
    val nS = hashes.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    val bands = hashes.select(col("doc_id"), col("frame_idx"),
      col("h0").as("h"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, " +
        "shiftrightunsigned(h0, b * 16) & 65535 AS bkey))")).as("bk"))
      .select(col("doc_id"), col("frame_idx"), col("h"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val occ = bands.groupBy(col("frame_idx"), col("band"), col("bkey"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val legacyHot = occ.where(col("n") > cap).count()
    val cold = bands.join(occ.where(col("n") <= cap)
        .select(col("frame_idx"), col("band"), col("bkey")),
      Seq("frame_idx", "band", "bkey"), "leftsemi")
    val legacyPairs = cold.as("x")
      .join(cold.as("y"),
        col("x.frame_idx") === col("y.frame_idx")
          && col("x.band") === col("y.band")
          && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.frame_idx").as("frame_idx"),
        col("x.h").as("pa"), col("y.h").as("pb"))
      .distinct()
      .where(expr("bit_count(pa ^ pb)") <= 3)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_frames"))
      .join(nS.select(col("doc_id").as("doc_a"), col("ns").as("na")), "doc_a")
      .join(nS.select(col("doc_id").as("doc_b"), col("ns").as("nb")), "doc_b")
      .where(col("n_frames") === col("na") && col("na") === col("nb"))
      .count()
    val legacySec = (System.nanoTime() - t0) / 1e9

    println(s"""{"metric":"band_cliff_probe","fold":"frame","rows":$n,""" +
      s""""planted_pairs":$groups,"new_pairs":$newPairs,""" +
      s""""new_law_pairs":$newLaw,"new_hot_buckets":$newHot,""" +
      s""""new_sec":$newSec,"legacy_pairs":$legacyPairs,""" +
      s""""legacy_hot_buckets":$legacyHot,"legacy_sec":$legacySec}""")
    assert(newPairs == groups && newLaw == groups && newHot == 0L,
      s"frame: $newPairs/$newLaw of $groups, hot $newHot")
    assert(legacyPairs < groups / 10,
      s"frame legacy should collapse: $legacyPairs of $groups")
  }

  /** `simhash`: per group g, docs 2g and 2g+1 share a 128-char binary
    * signature string (splitmix bits) — one hamming-0 pair per group.
    * Runs the SHIPPED 4×32-char simhashBandedPairs beside the legacy
    * 4×16-char keying over the same strings.
    */
  private def simhashSection(spark: org.apache.spark.sql.SparkSession,
      groups: Long): Unit = {
    import spark.implicits._
    val cap = graft.ops.Dedup.BandHotCap
    val sigs = spark.range(0, groups)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .flatMap { g =>
        // inline splitmix (a def on the probe object would drag the
        // non-serializable singleton into the closure)
        def mx(x: Long): Long = {
          var z = x + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        val a = mx(g * 0x632BE59BD9B4E019L + 0x1111L)
        val b = mx(g * 0x632BE59BD9B4E019L + 0x2222L)
        val sb = new java.lang.StringBuilder(128)
        var j = 0
        while (j < 64) { sb.append(((a >>> j) & 1L).toInt); j += 1 }
        j = 0
        while (j < 64) { sb.append(((b >>> j) & 1L).toInt); j += 1 }
        val s0 = sb.toString
        Seq((2 * g, s0), (2 * g + 1, s0))
      }
      .toDF("doc_id", "sig")
      .localCheckpoint()
    val n = sigs.count()

    var t0 = System.nanoTime()
    val (pairsDf, hotDf) = graft.ops.Dedup.simhashBandedPairs(sigs)
    val got = pairsDf.localCheckpoint()
    val newPairs = got.count()
    val newLaw = got.where(col("doc_b") === col("doc_a") + 1 &&
      col("doc_a") % 2 === 0 && col("hamming") === 0).count()
    val newHot = hotDf.first().getLong(0)
    val newSec = (System.nanoTime() - t0) / 1e9

    // legacy 4×16-char keying over the same 128-char strings: key
    // entropy identical to the retired 64-bit/4×16 signature path
    t0 = System.nanoTime()
    val bands = sigs.select(col("doc_id"), col("sig"),
      explode(expr("transform(sequence(0, 3), b -> " +
        "struct(b AS band, substr(sig, b * 16 + 1, 16) AS bkey))")).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val occ = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val legacyHot = occ.where(col("n") > cap).count()
    val cold = bands.join(occ.where(col("n") <= cap)
        .select(col("band"), col("bkey")),
      Seq("band", "bkey"), "leftsemi")
    val legacyPairs = cold.as("x")
      .join(cold.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        col("x.sig").as("sa"), col("y.sig").as("sb"))
      .distinct()
      .where((0 until 4).map(q =>
          expr(s"bit_count(cast(conv(substr(sa, ${32 * q + 1}, 32), 2, 10) as bigint)" +
            s" ^ cast(conv(substr(sb, ${32 * q + 1}, 32), 2, 10) as bigint))"))
        .reduce(_ + _) <= 3)
      .count()
    val legacySec = (System.nanoTime() - t0) / 1e9

    println(s"""{"metric":"band_cliff_probe","fold":"simhash","rows":$n,""" +
      s""""planted_pairs":$groups,"new_pairs":$newPairs,""" +
      s""""new_law_pairs":$newLaw,"new_hot_buckets":$newHot,""" +
      s""""new_sec":$newSec,"legacy_pairs":$legacyPairs,""" +
      s""""legacy_hot_buckets":$legacyHot,"legacy_sec":$legacySec}""")
    assert(newPairs == groups && newLaw == groups && newHot == 0L,
      s"simhash: $newPairs/$newLaw of $groups, hot $newHot")
    assert(legacyPairs < groups / 10,
      s"simhash legacy should collapse: $legacyPairs of $groups")
  }
}
