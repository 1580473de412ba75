package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The round-15 exact-dup pre-collapse inside [[Similarity.knnGraphOf]]
  * (q187) and q181's candidate expansion — the round-14 verdict's
  * carried `weak`: a dup group must cost LINEAR work, with output
  * byte-identical to the raw in-cell self-join it replaced. Pins, in
  * order of what could silently break:
  *
  *  1. EXACT output equality with the raw self-join form on a corpus
  *     that exercises every expansion branch: dup groups of size 1
  *     (the dup-free case — collapse must be a no-op), 2, 3 (< k+1),
  *     and 6 (> k+1: the in-group (k+1)-smallest cut binds);
  *  2. the cross-group cosine-1.0 TIE: a vector parallel to a dup
  *     group (v vs 2v — exact integer cosine 1.0, same as the group's
  *     self-cosine) must interleave with in-group siblings purely by
  *     neighbor id, across the group boundary;
  *  3. zero-norm dup groups: NULL cosines rank last in both forms and
  *     zero-norm members produce the same (possibly shorter) result;
  *  4. the per-rep top-k cross cut does not starve a member whose
  *     in-group siblings are outranked by cross-group candidates
  *     (high-id member of a low-cosine... covered by the mixed cell);
  *  5. q181's threshold-expansion: equality with its raw form on the
  *     same corpus (threshold sits between the planted cosines).
  */
class KnnCollapseSpec extends SparkSpec {
  import spark.implicits._

  /** (cluster, vec_id, v, nrm) with planted dup structure:
    * cell 0:  ids 1..6  all the SAME vector a=[4,0,0] (6-copy group),
    *          ids 10,11 the parallel vector 2a=[8,0,0] (cosine 1.0 to
    *          the a-group — the cross-group tie), id 20 b=[0,5,0]
    *          (orthogonal: cosine 0.0), id 21 c=[3,4,0] (cos 0.6 to a)
    * cell 1:  ids 30,31,32 the same vector d=[1,1,1] (3-copy group),
    *          id 33 e=[2,2,3] (high cosine to d), singleton id 34
    *          f=[-1,0,1]
    * cell 2:  ids 40,41 zero vectors (NULL cosine group), id 42
    *          g=[7,0,1] (every pair in cell 2 has a NULL or real mix)
    */
  private def corpus: DataFrame = {
    val a = Array(4L, 0L, 0L); val a2 = Array(8L, 0L, 0L)
    val b = Array(0L, 5L, 0L); val c = Array(3L, 4L, 0L)
    val d = Array(1L, 1L, 1L); val e = Array(2L, 2L, 3L)
    val f = Array(-1L, 0L, 1L); val z = Array(0L, 0L, 0L)
    val g = Array(7L, 0L, 1L)
    val rows =
      (1L to 6L).map(i => (0L, i, a)) ++
        Seq((0L, 10L, a2), (0L, 11L, a2), (0L, 20L, b), (0L, 21L, c)) ++
        Seq((1L, 30L, d), (1L, 31L, d), (1L, 32L, d), (1L, 33L, e),
          (1L, 34L, f)) ++
        Seq((2L, 40L, z), (2L, 41L, z), (2L, 42L, g))
    rows.toDF("cluster", "vec_id", "v")
      .withColumn("nrm",
        sqrt(Similarity.idot(col("v"), col("v")).cast("double")))
  }

  /** The raw q187 form this round replaced — in-cell self-join, every
    * member on both sides. Kept here as the equality referee.
    */
  private def rawKnn(iv: DataFrame, k: Int): DataFrame = {
    val q = iv.select(col("cluster"), col("vec_id").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(iv, Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(Similarity.idot(col("qv"), col("v")),
          col("qn"), col("nrm")).as("cosine"))
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  private def rows(df: DataFrame): Seq[(Long, Int, Long, Option[Double])] =
    df.select(col("query_id"), col("rank").cast("int"),
        col("neighbor_id"), col("cosine"))
      .as[(Long, Int, Long, Option[Double])].collect().toSeq

  test("collapsed k-NN graph equals the raw self-join form exactly (dups, ties, zero-norm)") {
    val iv = corpus.localCheckpoint()
    val got = rows(Similarity.knnGraphOf(iv, k = 3))
    val want = rows(rawKnn(iv, k = 3))
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("cross-group cosine-1.0 tie interleaves by neighbor id across the group boundary") {
    val iv = corpus.localCheckpoint()
    val got = rows(Similarity.knnGraphOf(iv, k = 3))
      .filter(_._1 == 5L) // a-copy: siblings 1..4,6 and parallels 10,11 all at cos 1.0
    // integer vectors make both the self-cosine and the parallel
    // cosine EXACTLY 1.0 (norms 4 and 8 are exact doubles), so the
    // top-3 is purely the 3 smallest other ids: 1, 2, 3
    assert(got.map(r => (r._2, r._3)) === Seq((1, 1L), (2, 2L), (3, 3L)))
    assert(got.forall(_._4.contains(1.0)))
    // ...and a parallel-group member ranks the a-group's small ids
    // ahead of its own sibling (id 11 > ids 1,2,3)
    val p10 = rows(Similarity.knnGraphOf(iv, k = 3)).filter(_._1 == 10L)
    assert(p10.map(_._3) === Seq(1L, 2L, 3L))
  }

  test("zero-norm groups: NULL cosines rank last identically in both forms") {
    val iv = corpus.localCheckpoint()
    val got = rows(Similarity.knnGraphOf(iv, k = 3)).filter(_._1 == 42L)
    val want = rows(rawKnn(iv, k = 3)).filter(_._1 == 42L)
    assert(got === want)
    // g's only cell mates are the two zero vectors: NULL cosines kept,
    // ordered by id
    assert(got.map(_._3) === Seq(40L, 41L) && got.forall(_._4.isEmpty))
  }

  test("q181 threshold-expansion equals its raw form on a dup-planted corpus") {
    val iv = corpus.localCheckpoint()
    // raw form: member-level scoring, self-excluded, threshold cut
    val q = iv.where(col("vec_id") < 20)
      .select(col("cluster"), col("vec_id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qn"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val want = rows(broadcast(q).join(iv, Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(Similarity.idot(col("qv"), col("v")),
          col("qn"), col("nrm")).as("cosine"))
      .where(col("cosine") < lit(Similarity.SemDedupThreshold))
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"))
      .orderBy(col("query_id"), col("rank")))
    // collapsed form: price reps, expand surviving groups' 5 smallest
    val wg = Window.partitionBy(col("cluster"), col("v"))
      .orderBy(col("vec_id"))
    val members = iv
      .withColumn("rep", min(col("vec_id")).over(wg))
      .withColumn("rnk", row_number().over(wg))
    val repv = members.where(col("vec_id") === col("rep"))
      .select(col("cluster"), col("rep"), col("v"), col("nrm"))
    val got = rows(broadcast(q).join(repv, Seq("cluster"))
      .select(col("query_id"), col("rep"),
        Similarity.cosine(Similarity.idot(col("qv"), col("v")),
          col("qn"), col("nrm")).as("cosine"))
      .where(col("cosine") < lit(Similarity.SemDedupThreshold))
      .join(members.where(col("rnk") <= 5)
        .select(col("rep"), col("vec_id").as("neighbor_id")), "rep")
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"))
      .orderBy(col("query_id"), col("rank")))
    assert(got === want)
    assert(want.nonEmpty)
    // the a-group queries (ids 1..6) must NOT list their own siblings
    // or the parallel group (cosine 1.0 ≥ threshold) — only b (0.0)
    assert(want.filter(_._1 == 1L).map(_._3) === Seq(20L))
  }
}
