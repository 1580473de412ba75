package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact per-cell order-statistic selection ([[Selection.headK]]) and
  * its q164 composition ([[Similarity.prototypePruneRadixKeep]]) —
  * the implemented mega-cell escalation: the keep decision must equal
  * the rank-window form EXACTLY, with no window ever sorting a whole
  * cell. Pins, hardest first:
  *
  *  1. the ALL-TIES mega-cell: thousands of byte-identical vectors in
  *     one cell (every proto equal, selection decided purely by the
  *     vec_id tiebreak) — the shape that defeats fixed-quota salting
  *     and any sampling-based selection;
  *  2. proportional k across wildly different cell sizes in one call
  *     (k is per-key, not a constant);
  *  3. headK against a brute-force JVM sort on adversarial longs
  *     (negative k1, full 64-bit range — the signed/unsigned digit
  *     boundary);
  *  4. radix keep == q164's kept set on the real sf0.001 table.
  */
class ProtoRadixSpec extends SparkSpec {
  import spark.implicits._

  test("headK equals brute-force selection on adversarial signed keys") {
    val rows = Seq(
      // key 1: negatives, extremes, dense ties on k1
      (1, Long.MinValue, 10L), (1, Long.MinValue, 3L), (1, -1L, 7L),
      (1, 0L, 1L), (1, 0L, 2L), (1, 5L, 9L), (1, Long.MaxValue, 4L),
      // key 2: all k1 tied — pure k2 selection
      (2, 42L, 6L), (2, 42L, 5L), (2, 42L, 8L), (2, 42L, 1L),
      // key 3: kk larger than the row count (clamped to take all)
      (3, -9L, 2L), (3, 9L, 1L))
    val ks = Seq((1, 3L), (2, 2L), (3, 99L)).toDF("cluster", "kk")
    val got = Selection.headK(
        rows.toDF("cluster", "ok1", "ok2"), ks)
      .as[(Int, Long)].collect().toSet
    val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      val kk = Map(1 -> 3, 2 -> 2, 3 -> 99)(k)
      rs.sortBy(r => (r._2, r._3)).take(kk).map(r => (k, r._3))
    }.toSet
    assert(got === want)
    // and kk <= 0 selects nothing
    val none = Selection.headK(rows.toDF("cluster", "ok1", "ok2"),
      Seq((1, 0L), (2, -5L)).toDF("cluster", "kk"))
    assert(none.count() === 0)
  }

  test("double_order_bits reproduces Double.compare order, including the IEEE corners") {
    val doubles = Seq(Double.NegativeInfinity, -1.5e300, -2.0, -1.0,
      -Double.MinPositiveValue, -0.0, 0.0, Double.MinPositiveValue,
      1.0, 2.0, 1.5e300, Double.PositiveInfinity, Double.NaN)
    val enc = doubles.zipWithIndex.toDF("d", "i")
      .selectExpr("i", "double_order_bits(d) AS b")
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    // the input list is ascending under Double.compare (NaN greatest,
    // -0.0 < 0.0), so the encodings must be STRICTLY ascending longs
    enc.sliding(2).foreach { case Array(a, b) =>
      assert(a < b, s"encoding not strictly ascending: $a >= $b")
    }
    // and -0.0 / 0.0 are adjacent but distinct (Double.compare says so)
    val z = Seq(-0.0, 0.0).toDF("d")
      .selectExpr("double_order_bits(d) AS b").as[Long].collect()
    assert(z(0) === z(1) - 1)
  }

  test("radix keep equals the window keep on an all-ties mega-cell plus small cells") {
    val d = java.nio.file.Files.createTempDirectory("graft-radix").toString
    // one mega-group of byte-identical vectors (all protos tie) plus
    // two small distinct blocks
    val mega: Seq[Float] =
      Array.tabulate(64)(dim => 10.0f + 0.001f * (dim % 3)).toSeq
    def block(b: Int, j: Int): Seq[Float] =
      Array.tabulate(64) { dim =>
        (if (dim / 16 == b) 8.0f else 0.0f) + 0.002f * ((j + dim) % 5)
      }.toSeq
    val rows = (0 until 3000).map(j => (j.toLong, mega, 0)) ++
      (0 until 40).map(j => (10000L + j, block(1, j), 1)) ++
      (0 until 25).map(j => (20000L + j, block(2, j), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    Similarity.q164PrototypePrune(spark, d).collect() // stages cells
    val a = Similarity.scaledVectors(spark, d).where(col("nrm") > 0)
      .select(col("vec_id"), col("v"), col("nrm"))
      .join(spark.read.parquet(
        Staged.path(Dedup.stageRoot(d), "cells")), "vec_id")
    val windowKeep = Similarity.prototypePruneOf(a)
      .select(col("cluster"), col("vec_id")).as[(Int, Long)]
      .collect().toSet
    val radixKeep = Similarity.prototypePruneRadixKeep(a)
      .select(col("cluster"), col("vec_id")).as[(Int, Long)]
      .collect().toSet
    assert(radixKeep === windowKeep)
    assert(radixKeep.nonEmpty)
    // the mega-group genuinely exercised the tie path: at least one
    // cell held >= 2000 members and was cut by floor(n*p)
    val sizes = spark.read.parquet(s"${Dedup.stageRoot(d)}/cells")
      .groupBy(col("cluster")).count().as[(Int, Long)].collect().toMap
    assert(sizes.values.max >= 2000L, s"mega-cell split: $sizes")
  }

  test("auto routing: a planted mega-cell flips to the radix lane with the identical keep set") {
    val d = java.nio.file.Files.createTempDirectory("graft-radix-auto").toString
    val mega: Seq[Float] =
      Array.tabulate(64)(dim => 10.0f + 0.001f * (dim % 3)).toSeq
    def block(b: Int, j: Int): Seq[Float] =
      Array.tabulate(64) { dim =>
        (if (dim / 16 == b) 8.0f else 0.0f) + 0.002f * ((j + dim) % 5)
      }.toSeq
    val rows = (0 until 3000).map(j => (j.toLong, mega, 0)) ++
      (0 until 40).map(j => (10000L + j, block(1, j), 1)) ++
      (0 until 25).map(j => (20000L + j, block(2, j), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    Similarity.q164PrototypePrune(spark, d).collect() // stages cells
    val a = Similarity.scaledVectors(spark, d).where(col("nrm") > 0)
      .select(col("vec_id"), col("v"), col("nrm"))
      .join(spark.read.parquet(
        Staged.path(Dedup.stageRoot(d), "cells")), "vec_id")
    val windowKeep = Similarity.prototypePruneOf(a)
      .select(col("cluster"), col("vec_id")).as[(Int, Long)]
      .collect().toSet
    // occupancy bound under the planted 3000-copy cell: the mega cell
    // MUST route to radix, the small cells MUST stay on the window
    val autoKeep = Similarity.prototypePruneAuto(a, megaOccupancy = 1000L)
      .select(col("cluster"), col("vec_id")).as[(Int, Long)]
      .collect().toSet
    assert(Similarity.lastAutoMegaCells >= 1,
      "the 3000-member cell did not route to the radix lane")
    assert(autoKeep === windowKeep)
    // default bound at this corpus size: everything stays on the
    // window lane and the output is unchanged
    val autoDefault = Similarity.prototypePruneAuto(a)
      .select(col("cluster"), col("vec_id")).as[(Int, Long)]
      .collect().toSet
    assert(Similarity.lastAutoMegaCells === 0)
    assert(autoDefault === windowKeep)
  }

  test("a NULL proto (zero-norm quantized centroid) fails by name, never diverges silently") {
    // two antipodal vectors in one cell: per-dim sums are 0, so the
    // quantized centroid is the zero vector (cnrm = 0) and every proto
    // cosine is NULL — outside the radix total order. The guard must
    // throw by name; before it, these rows silently vanished from the
    // digit counts while still inflating kk = floor(n*p).
    val v1: Seq[Long] = Array.fill(64)(100L).toSeq
    val a = Seq((1L, v1, 800.0, 9), (2L, v1.map(-_), 800.0, 9))
      .toDF("vec_id", "v", "nrm", "cluster")
    val e = intercept[Throwable] {
      Similarity.prototypePruneRadixKeep(a).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("NULL proto"), s"unexpected failure: $msgs")
  }

  test("radix keep equals the q164 kept set on the real sf0.001 table") {
    val dir = "/root/testdata/sf0.001"
    val windowKeep = Similarity.q164PrototypePrune(spark, dir)
      .select(col("cluster"), col("vec_id")).as[(Int, Long)]
      .collect().toSet
    val work = Dedup.stageRoot(dir)
    val a = Similarity.scaledVectors(spark, dir).where(col("nrm") > 0)
      .select(col("vec_id"), col("v"), col("nrm"))
      .join(spark.read.parquet(Staged.path(work, "cells")), "vec_id")
    val radixKeep = Similarity.prototypePruneRadixKeep(a)
      .select(col("cluster"), col("vec_id")).as[(Int, Long)]
      .collect().toSet
    assert(radixKeep === windowKeep)
    assert(radixKeep.nonEmpty)
  }
}
