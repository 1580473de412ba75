package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout (q162 + CorpusSink.writeZOrdered). Pins:
  *
  *   - the column-arithmetic Morton key equals a plain-Scala bit
  *     interleave on an exhaustive 8-bit × 8-bit sweep (sampled grid
  *     plus the corners), and is a bijection on that domain
  *   - on a planted 16-lang × 16-length grid written z-ordered into
  *     16 files, a one-lang scan touches a strict subset of the files
  *     (the locality the layout exists for) while a naive doc_id-sorted
  *     layout of the same rows touches ALL of them
  *   - the z-ordered write loses and duplicates nothing
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(b1: Long, b2: Long): Long =
    (0 until 8).map { i =>
      (((b1 >> i) & 1L) << (2 * i + 1)) + (((b2 >> i) & 1L) << (2 * i))
    }.sum

  test("the Morton key column equals the plain-Scala interleave and is a bijection") {
    val grid = for (a <- 0L until 256L by 5L; b <- 0L until 256L by 7L)
      yield (a, b)
    val cases = (grid ++ Seq((0L, 0L), (255L, 255L), (0L, 255L),
      (255L, 0L))).distinct
    val got = cases.toDF("b1", "b2")
      .select($"b1", $"b2",
        CorpusSink.zorderKey($"b1", $"b2").as("zkey"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z === mortonRef(a, b), s"interleave($a, $b)")
    }
    assert(got.map(_._3).distinct.length === cases.length, "not injective")
  }

  test("a one-lang scan of the z-ordered layout touches a strict subset of files; round-trip exact") {
    // 16 langs x 16 length buckets, 4 docs per grid cell; lang varies
    // FASTEST in doc_id so the naive id-range layout scatters each
    // lang across every file (the realistic arrival order)
    val docs = (for {
      l <- 0 until 16; n <- 0 until 16; r <- 0 until 4
    } yield {
      val id = (n * 4L + r) * 16L + l
      (id, ('a' + l).toChar.toString + "x", 64L * (4 * n + r))
    }).toDF("doc_id", "lang", "n_chars")

    val keyed = docs.select($"doc_id", $"lang", $"n_chars",
      least(lit(255L), expr("n_chars div 64")).as("len_bucket"),
      ((ascii(substring($"lang", 1, 1)) * 31 +
        ascii(substring($"lang", 2, 1))) % 256).cast("long")
        .as("lang_bucket"))

    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    CorpusSink.writeZOrdered(keyed, s"$out/z",
      CorpusSink.zorderKey($"len_bucket", $"lang_bucket"), files = 16)
    // the naive one-dimensional baseline: same rows, doc_id ranges
    docs.repartitionByRange(16, $"doc_id")
      .sortWithinPartitions($"doc_id")
      .write.parquet(s"$out/naive")

    val back = spark.read.parquet(s"$out/z")
    assert(back.count() === docs.count())
    assert(back.select($"doc_id").as[Long].collect().sorted.toSeq ===
      docs.select($"doc_id").as[Long].collect().sorted.toSeq)

    def filesTouched(path: String): Long =
      spark.read.parquet(path).where($"lang" === "ax")
        .select(input_file_name()).distinct().count()
    val total = spark.read.parquet(s"$out/z")
      .select(input_file_name()).distinct().count()
    val zTouched = filesTouched(s"$out/z")
    val naiveTouched = filesTouched(s"$out/naive")
    assert(total >= 8L, s"layout produced only $total files")
    assert(zTouched * 2 <= total,
      s"one-lang scan touched $zTouched of $total z-ordered files")
    assert(naiveTouched * 2 > total,
      s"naive layout unexpectedly local: $naiveTouched of $total")
  }
}
