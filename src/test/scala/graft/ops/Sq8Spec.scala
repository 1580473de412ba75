package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization (q167): the staged params/codes must replay
  * bit-for-bit in plain JVM arithmetic, the midpoint reconstruction
  * must respect the half-bucket error bound 512·|x − x̂| ≤ st per
  * dimension, the query-side lo/st decomposition must equal the
  * reconstruction dot exactly (the algebra that lets the corpus term
  * ride one codegen'd integer dot over raw codes), and the full
  * serving chain must EQUAL the exact staged multi-probe search when
  * the shortlist covers every candidate — on a planted corpus small
  * enough that the top-[[Similarity.RerankShortlist]] cut cuts
  * nothing, q167 == q79 is a theorem, not an approximation.
  *
  * The plant exercises the edge paths: negative components (the
  * global per-dim min keeps x − lo non-negative, so BIGINT `div`
  * matches DuckDB `//`), a CONSTANT dimension (st = 0 → code 0,
  * reconstruction pinned to 512·lo, zero error), and the code-255
  * clamp at x = hi.
  */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val N = 30

  /** Deterministic planted floats: two loose clusters plus noise,
    * negatives included; dim 7 constant across the corpus (st = 0).
    */
  private lazy val raw: Array[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Array.tabulate(N) { id =>
      val base = if (id % 2 == 0) 0.8f else -0.6f
      Array.tabulate(Dim) { d =>
        if (d == 7) 0.5f
        else base * ((d % 5) + 1) / 5.0f + (rnd.nextFloat() - 0.5f) * 0.3f
      }
    }
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-sq8").toString
    raw.zipWithIndex.map { case (v, id) => (id.toLong, v, 0) }.toSeq
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  /** Plain-JVM replay of the staged arithmetic, from the same floats. */
  private lazy val jvm: (Array[Long], Array[Long], Map[Long, (Array[Long], Long)]) = {
    val scaled = raw.map(_.map(x => math.floor(x.toDouble * 65536.0).toLong))
    val lo = Array.tabulate(Dim)(d => scaled.map(_(d)).min)
    val hi = Array.tabulate(Dim)(d => scaled.map(_(d)).max)
    val st = Array.tabulate(Dim)(d => hi(d) - lo(d))
    val codes = scaled.zipWithIndex.map { case (v, id) =>
      val c = Array.tabulate(Dim) { d =>
        if (st(d) > 0) math.min((v(d) - lo(d)) * 256L / st(d), 255L) else 0L
      }
      val r = Array.tabulate(Dim)(d => 512L * lo(d) + (2L * c(d) + 1L) * st(d))
      id.toLong -> (c, r.map(x => x * x).sum)
    }.toMap
    (lo, st, codes)
  }

  private lazy val staged: String = {
    val work = Dedup.stageRoot(dir)
    Similarity.stageSq8(spark, dir, work)
    work
  }

  test("staged params and codes replay bit-for-bit in plain JVM") {
    val (lo, st, codes) = jvm
    val params = spark.read.parquet(s"$staged/sq_params")
      .orderBy($"dim").collect()
    assert(params.length === Dim)
    params.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[Long]("lo") === lo(i), s"lo mismatch at dim ${i + 1}")
      assert(row.getAs[Long]("hi") - row.getAs[Long]("lo") === st(i),
        s"step mismatch at dim ${i + 1}")
    }
    val got = spark.read.parquet(s"$staged/sq_codes")
      .select($"vec_id", $"c", $"rsq")
      .as[(Long, Array[Long], Long)].collect()
      .map { case (id, c, rsq) => id -> ((c.toSeq, rsq)) }.toMap
    assert(got.size === N)
    codes.foreach { case (id, (c, rsq)) =>
      assert(got(id)._1 === c.toSeq, s"code mismatch for vec $id")
      assert(got(id)._2 === rsq, s"rsq mismatch for vec $id")
    }
  }

  test("codes stay in [0,255]; reconstruction obeys the half-bucket bound") {
    val (lo, st, codes) = jvm
    val scaled = raw.map(_.map(x => math.floor(x.toDouble * 65536.0).toLong))
    var clamped = 0
    codes.foreach { case (id, (c, _)) =>
      (0 until Dim).foreach { d =>
        assert(c(d) >= 0L && c(d) <= 255L)
        if (c(d) == 255L) clamped += 1
        val r = 512L * lo(d) + (2L * c(d) + 1L) * st(d)
        val err = math.abs(512L * scaled(id.toInt)(d) - r)
        assert(err <= st(d),
          s"vec $id dim $d: |512x - r| = $err > st = ${st(d)}")
        if (st(d) == 0L) assert(err === 0L, s"constant dim $d must be exact")
      }
    }
    // every per-dim max hits the clamp (x = hi → code 255), so the
    // clamp path is genuinely exercised at least once per variable dim
    assert(clamped >= Dim - 1, s"expected >= ${Dim - 1} clamped codes, got $clamped")
  }

  test("query-side lo/st decomposition equals the reconstruction dot") {
    val (lo, st, codes) = jvm
    val scaled = raw.map(_.map(x => math.floor(x.toDouble * 65536.0).toLong))
    (0 until 5).foreach { qi =>
      val q = scaled(qi)
      codes.foreach { case (_, (c, _)) =>
        val r = Array.tabulate(Dim)(d => 512L * lo(d) + (2L * c(d) + 1L) * st(d))
        val direct = (0 until Dim).map(d => q(d) * r(d)).sum
        val qlo = (0 until Dim).map(d => q(d) * lo(d)).sum
        val qssum = (0 until Dim).map(d => q(d) * st(d)).sum
        val folded = 512L * qlo + 2L * (0 until Dim).map(d => q(d) * st(d) * c(d)).sum + qssum
        assert(folded === direct)
      }
    }
  }

  test("q167 equals the exact staged search when the shortlist covers all candidates") {
    val exact = Similarity.q79AnnIvfMultiprobe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val sq = Similarity.q167Sq8Rerank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(sq.nonEmpty)
    assert(sq === exact,
      "SQ8 shortlist + exact re-rank must equal exact search on a covered corpus")
  }

  test("a warm run never re-stages the SQ8 assets") {
    def mtime(name: String) =
      new java.io.File(s"$staged/$name/_SUCCESS").lastModified()
    Similarity.q167Sq8Rerank(spark, dir).collect()
    val (mp, mc) = (mtime("sq_params"), mtime("sq_codes"))
    Similarity.q167Sq8Rerank(spark, dir).collect()
    assert(mtime("sq_params") === mp && mtime("sq_codes") === mc,
      "q167 re-staged warm SQ8 assets")
  }
}
